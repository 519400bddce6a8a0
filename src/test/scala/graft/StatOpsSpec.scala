package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.StatOps

/** Value-level checks for the statistical-profiling operators
  * (q136–q138): OLS recovers an exactly-linear series, the transition
  * matrix respects the (ts, event_id) ordering contract, and the
  * correlation aggregate matches a driver-side two-pass Pearson on the
  * real table. The DuckDB oracle pins all three on the driver tables. */
class StatOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def linearDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("stat").toString
    // brand B1: price = 100 + 2*day, one observation per day — the OLS
    // fit must be exact. brand B2: constant price → slope 0, and the
    // ANSI convention for zero y-variance with varying x is r2 = 1
    // (verified identical in Spark and DuckDB).
    val rows = (0 until 10).map { day =>
      (day.toLong, 1L, 1L, day + 1, 1.0, 100.0 + 2.0 * day, 0.0, 0.0, "N", "O",
        java.time.LocalDateTime.parse("1992-01-01T00:00:00").plusDays(day.toLong))
    } ++ (0 until 5).map { day =>
      (100L + day, 2L, 1L, day + 1, 1.0, 50.0, 0.0, 0.0, "N", "O",
        java.time.LocalDateTime.parse("1992-01-01T00:00:00").plusDays(day.toLong))
    }
    rows.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    Seq((1L, "part one", "B1", "t", 1, 1.0), (2L, "part two", "B2", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/part.parquet")
    d
  }

  test("price trend recovers an exact linear series (slope 2, r2 1)") {
    val r = StatOps.priceTrend(spark, linearDir()).collect()
      .map(x => x.getString(0) -> x).toMap
    val b1 = r("B1")
    assert(b1.getLong(1) == 10L)
    assert(b1.getDouble(2) == 2.0, "slope of y=100+2x must be exactly 2")
    assert(b1.getDouble(3) == 100.0)
    assert(b1.getDouble(4) == 1.0, "a perfect fit has r2 = 1")
    val b2 = r("B2")
    assert(b2.getDouble(2) == 0.0, "constant series has slope 0")
    assert(b2.getDouble(4) == 1.0, "ANSI: zero y-variance with varying x gives r2 = 1")
  }

  test("event transitions count per-user steps and break ts ties by event_id") {
    val d = java.nio.file.Files.createTempDirectory("trans").toString
    def ns(day: Int): Long = (19723L + day) * 86400L * 1000000000L
    // user 1: a→b→a; user 2: a→b; user 3: x,y at the SAME ts — the
    // event-id tiebreak must yield x→y, never y→x.
    val ev = Seq(
      (1L, ns(0), 1L, "a"), (2L, ns(1), 1L, "b"), (3L, ns(2), 1L, "a"),
      (4L, ns(0), 2L, "a"), (5L, ns(1), 2L, "b"),
      (10L, ns(0), 3L, "x"), (11L, ns(0), 3L, "y"))
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") })
    val r = StatOps.eventTransitions(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) -> (x.getLong(2), x.getDouble(3)))
      .toMap
    assert(r(("a", "b")) == ((2L, 1.0)))
    assert(r(("b", "a")) == ((1L, 1.0)))
    assert(r(("x", "y")) == ((1L, 1.0)))
    assert(!r.contains(("y", "x")), "tie must resolve by event_id, deterministically")
    // row-normalization: probabilities per from_type sum to 1
    r.groupBy(_._1._1).foreach { case (from, xs) =>
      assert(math.abs(xs.values.map(_._2).sum - 1.0) < 1e-9, s"rows of $from")
    }
  }

  test("revenue acf: alternating series gives acf1 = -1, linear ramp gives +1") {
    val d = java.nio.file.Files.createTempDirectory("acf").toString
    def day(i: Int) =
      java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)
    // priority A: one order per day, revenue alternating 100/200 → the
    // lag-1 series is perfectly anticorrelated; lag 7 (odd) likewise.
    // priority B: revenue = 100 + 10·day → both lags perfectly correlated.
    val rows = (0 until 10).map { i =>
      (i.toLong, 1L, "O", if (i % 2 == 0) 100.0 else 200.0, day(i), "A")
    } ++ (0 until 10).map { i =>
      (100L + i, 1L, "O", 100.0 + 10.0 * i, day(i), "B")
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = StatOps.revenueAcf(spark, d).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("A").getLong(1) == 10L)
    assert(r("A").getDouble(2) == -1.0, "alternating daily revenue → acf1 -1")
    assert(r("A").getDouble(3) == -1.0, "odd lag of a period-2 series stays -1")
    assert(r("B").getDouble(2) == 1.0, "linear ramp → acf1 +1")
    assert(r("B").getDouble(3) == 1.0, "linear ramp → acf7 +1")
  }

  test("benford digits come from exact cents arithmetic, shares sum to 1") {
    val d = java.nio.file.Files.createTempDirectory("benford").toString
    def day(i: Int) =
      java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)
    // prices chosen to hit tricky digit extractions: 0.50 → leading
    // significant digit 5; 999.99 → 9; 10.00 → 1; 1000.00 → 1.
    val prices = Seq(10.00, 1000.00, 0.50, 999.99, 25.50, 19.99)
    prices.zipWithIndex.map { case (p, i) =>
      (i.toLong, 1L, 1L, 1, 1.0, p, 0.0, 0.0, "N", "O", day(i))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = StatOps.benfordPrices(spark, d).collect()
      .map(x => x.getInt(0) -> x.getLong(1)).toMap
    assert(r == Map(1 -> 3L, 2 -> 1L, 5 -> 1L, 9 -> 1L))
    val shares = StatOps.benfordPrices(spark, d).collect().map(_.getDouble(2))
    assert(math.abs(shares.sum - 1.0) < 1e-5,
      "per-digit 6dp rounding can shift the sum by a few 1e-6")
  }

  test("event gaps: exact per-type inter-arrival moments within a user") {
    val d = java.nio.file.Files.createTempDirectory("gaps").toString
    def ns(sec: Long): Long = 1700000000L * 1000000000L + sec * 1000000000L
    // user 1 type a at 0s/10s/30s → gaps 10,20 (avg 15, sd 5, max 20);
    // interleaved type b events must not contaminate the a-gaps.
    val ev = Seq(
      (1L, ns(0), 1L, "a"), (2L, ns(10), 1L, "a"), (3L, ns(30), 1L, "a"),
      (4L, ns(5), 1L, "b"), (5L, ns(6), 1L, "b"),
      (6L, ns(100), 2L, "a")) // single event → no gap
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") })
    val r = StatOps.eventGapProfile(spark, d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getDouble(2), x.getDouble(3), x.getDouble(4)))).toMap
    assert(r("a") == ((2L, 15.0, 5.0, 20.0)))
    assert(r("b") == ((1L, 1.0, 0.0, 1.0)))
  }

  test("top paths slide a 3-step window per user and rank by count then path") {
    val d = java.nio.file.Files.createTempDirectory("paths").toString
    def ns(sec: Long): Long = 1700000000L * 1000000000L + sec * 1000000000L
    // user 1: a,b,c,d → paths a>b>c and b>c>d; user 2: a,b,c → a>b>c
    val ev = Seq(
      (1L, ns(0), 1L, "a"), (2L, ns(1), 1L, "b"),
      (3L, ns(2), 1L, "c"), (4L, ns(3), 1L, "d"),
      (5L, ns(0), 2L, "a"), (6L, ns(1), 2L, "b"), (7L, ns(2), 2L, "c"))
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") })
    val r = StatOps.topPaths(spark, d).collect()
      .map(x => (x.getString(0), x.getLong(1)))
    assert(r.toSeq == Seq(("a>b>c", 2L), ("b>c>d", 1L)),
      "count-desc then path-asc; windows never cross users")
  }

  test("winsorized mean clips exactly one tail day on a spiked series") {
    val d = java.nio.file.Files.createTempDirectory("wins").toString
    def day(i: Int) =
      java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)
    // 20 strictly increasing days (100, 110, …, 290) plus a 10000
    // spike. percent_rank = (rank−1)/20, so p5 clamps day 1 up to 110
    // and p95 clamps the spike down to 290: exactly two days clip, and
    // the winsorized mean is exactly 200 while the raw mean carries the
    // spike.
    val rows = (0 until 21).map { i =>
      (i.toLong, 1L, "O", if (i == 20) 10000.0 else 100.0 + 10.0 * i, day(i), "A")
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = StatOps.winsorizedDaily(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 21L)
    assert(row.getDouble(2) == 110.0 && row.getDouble(3) == 290.0,
      "p5/p95 boundaries from percent_rank")
    assert(row.getLong(4) == 2L, "one low day and the spike clip")
    assert(row.getDouble(6) == 200.0, "winsorized mean is exact")
    assert(math.abs(row.getDouble(5) - 13900.0 / 21) < 1e-2,
      "raw mean carries the spike")
  }

  test("cusum peaks exactly at the regime boundary of a step series") {
    val d = java.nio.file.Files.createTempDirectory("cusum").toString
    def day(i: Int) =
      java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)
    // 10 days at 100, then 10 at 200: mean 150, deviations ∓50 — the
    // running sum bottoms at -500 on day 9, the last old-regime day.
    val rows = (0 until 20).map { i =>
      (i.toLong, 1L, "O", if (i < 10) 100.0 else 200.0, day(i), "A")
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = StatOps.cusumChangepoint(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getDate(2).toLocalDate ==
      java.time.LocalDate.parse("1995-01-10"), "peak on the last old-regime day")
    assert(row.getDouble(3) == -500.0)
    assert(row.getDouble(4) == 150.0)
  }

  test("daily type entropy: uniform two-type day gives ln 2, pure day gives 0") {
    val d = java.nio.file.Files.createTempDirectory("entropy").toString
    def ns(day: Int, k: Int): Long =
      (19723L + day) * 86400L * 1000000000L + k * 1000000000L
    val ev = Seq(
      (1L, ns(0, 0), 1L, "a"), (2L, ns(0, 1), 1L, "b"),
      (3L, ns(0, 2), 2L, "a"), (4L, ns(0, 3), 2L, "b"),
      (5L, ns(1, 0), 1L, "a"), (6L, ns(1, 1), 2L, "a"))
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") })
    val r = StatOps.dailyTypeEntropy(spark, d).collect()
      .map(x => (x.getLong(1), x.getLong(2), x.getDouble(3)))
    assert(r.length == 2)
    assert(r(0) == ((4L, 2L, math.rint(math.log(2) * 1e6) / 1e6)))
    assert(r(1) == ((2L, 1L, 0.0)), "a single-type day has zero entropy")
  }

  test("gini: equal spenders score 0, a whale market scores its exact index") {
    val d = java.nio.file.Files.createTempDirectory("gini").toString
    def day(i: Int) =
      java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)
    // nation 0: two equal customers → G = 0; nation 1: 10 vs 990 →
    // G = 2(1·10+2·990)/(2·1000) − 3/2 = 0.49 exactly.
    val orders = Seq(
      (1L, 1L, 100.0), (2L, 2L, 100.0), (3L, 3L, 10.0), (4L, 4L, 990.0))
    orders.zipWithIndex.map { case ((ok, ck, p), i) =>
      (ok, ck, "O", p, day(i), "A")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((1L, "c1", 0, 0.0, "B"), (2L, "c2", 0, 0.0, "B"),
        (3L, "c3", 1, 0.0, "B"), (4L, "c4", 1, 0.0, "B"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/customer.parquet")
    val r = StatOps.spendGini(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getDouble(3)))).toMap
    assert(r(0L) == ((2L, 0.0)))
    assert(r(1L) == ((2L, 0.49)))
  }

  test("source diversity: balanced sources count fully, monoculture scores 1") {
    val d = java.nio.file.Files.createTempDirectory("divers").toString
    Seq((0L, "a b", "en", "s1"), (1L, "c d", "en", "s2"),
        (2L, "e f", "fr", "s1"), (3L, "g h", "fr", "s1"))
      .map { case (id, tx, lg, src) => (id, tx, lg, src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = StatOps.sourceDiversity(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r("en") == ((2L, 2L, 2.0)), "two balanced sources = 2 effective")
    assert(r("fr") == ((2L, 1L, 1.0)), "monoculture = 1 effective source")
  }

  test("lead time: exact day moments from a controlled order/ship spread") {
    val d = java.nio.file.Files.createTempDirectory("lead").toString
    def day(i: Int) =
      java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)
    // one order placed day 0; lines ship at +2, +4, +6 → mean 4, sd
    // sqrt(8/3), max 6
    Seq((1L, 1L, "O", 100.0, day(0), "A"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq(2, 4, 6).zipWithIndex.map { case (sd, i) =>
      (1L, 1L, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", day(sd))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val r = StatOps.leadTimeProfile(spark, d).collect().head
    assert(r.getLong(1) == 3L && r.getDouble(2) == 4.0)
    assert(math.abs(r.getDouble(3) - math.sqrt(8.0 / 3)) < 1e-3)
    assert(r.getLong(4) == 6L)
  }

  test("tokenizer fertility is the exact chars-over-tokens ratio per language") {
    val d = java.nio.file.Files.createTempDirectory("fert").toString
    // en: "ab cd" (5 chars, 2 tokens) ×2 → 10/4 = 2.5;
    // zh: "abcdefgh x" (10 chars, 2 tokens) → 5.0
    Seq((0L, "ab cd", "en"), (1L, "ab cd", "en"), (2L, "abcdefgh x", "zh"))
      .map { case (id, tx, lg) => (id, tx, lg, "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = StatOps.tokenizerFertility(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3), x.getDouble(4))))
      .toMap
    assert(r("en") == ((10L, 4L, 2.5)))
    assert(r("zh") == ((10L, 2L, 5.0)))
  }

  test("corr aggregate matches a driver-side two-pass Pearson on lineitem") {
    val rows = graft.Tables.t(spark, sfDir, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (flag, xs) =>
      val n = xs.length.toDouble
      val mx = xs.map(_._2).sum / n
      val my = xs.map(_._3).sum / n
      val cov = xs.map(t => (t._2 - mx) * (t._3 - my)).sum / n
      val sx = math.sqrt(xs.map(t => (t._2 - mx) * (t._2 - mx)).sum / n)
      val sy = math.sqrt(xs.map(t => (t._3 - my) * (t._3 - my)).sum / n)
      flag -> cov / (sx * sy)
    }
    val got = StatOps.measureCorr(spark, sfDir).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(got.keySet == expected.keySet)
    expected.foreach { case (flag, e) =>
      assert(math.abs(got(flag) - e) < 1e-4, s"corr($flag): got ${got(flag)}, want $e")
    }
  }

  test("composed corr matches built-in corr under asymmetric nulls") {
    // covar_pop sees only pairwise-complete rows, so the composed
    // denominator must mask each side by the OTHER side's nullness —
    // a bare stddev_pop(x) would include x-rows whose y is null and
    // diverge from both Spark's and DuckDB's built-in corr the moment
    // nulls are asymmetric. This fixture nulls the three measures on
    // different moduli so every pairwise-complete set differs from
    // every single-column non-null set.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-corrnull").toString
    // Real lineitem schema (the table boundary validates it), with the
    // three measures nulled on DIFFERENT moduli of the row identity.
    val rowId = col("l_orderkey") * 8 + col("l_linenumber")
    spark.read.parquet(s"$sfDir/lineitem.parquet")
      .withColumn("l_quantity",
        when(rowId % 3 =!= 0, col("l_quantity")))
      .withColumn("l_extendedprice",
        when(rowId % 5 =!= 0, col("l_extendedprice")))
      .withColumn("l_discount",
        when(rowId % 7 =!= 0, col("l_discount")))
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val got = StatOps.measureCorr(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Double]("corr_qty_price"), r.getAs[Double]("corr_price_disc")))
      .toMap
    val want = spark.read.parquet(s"$dir/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(corr(col("l_quantity"), col("l_extendedprice")).as("c1"),
        corr(col("l_extendedprice"), col("l_discount")).as("c2"))
      .collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (flag, (c1, c2)) =>
      assert(math.abs(got(flag)._1 - c1) <= 1e-6,
        s"corr_qty_price($flag): got ${got(flag)._1}, want $c1")
      assert(math.abs(got(flag)._2 - c2) <= 1e-6,
        s"corr_price_disc($flag): got ${got(flag)._2}, want $c2")
    }
  }
}
