package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{GraphOps, StatOps}

/** Differential gate for the statistical operators: SEEDED random
  * fixtures (not hand-picked cases) checked against independent
  * driver-side reference implementations on every `sbt test` — the
  * DifferentialGateSpec idea applied to q141/q150/q154/q157. The
  * references replicate the documented determinism contracts (exact
  * integer fixed point, midpoint quantization, percent_rank boundaries)
  * with plain Scala loops, so an implementation drift in the Spark plan
  * OR in the contract shows up as a value mismatch here before the
  * oracle ever runs. */
class StatDifferentialSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val rnd = new scala.util.Random(0x5eed)

  private def day(i: Int) =
    java.time.LocalDateTime.parse("1995-01-01T00:00:00").plusDays(i.toLong)

  test("revenue acf matches a driver-side Pearson over the lagged series") {
    val n = 120
    // one order per day with random revenue on a 2-decimal grid
    val revs = Vector.fill(n)(math.floor(rnd.nextDouble() * 100000) / 100.0)
    val d = java.nio.file.Files.createTempDirectory("acfdiff").toString
    revs.zipWithIndex.map { case (r, i) =>
      (i.toLong, 1L, "O", r, day(i), "A")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    def pearson(pairs: Seq[(Double, Double)]): Double = {
      val m = pairs.length.toDouble
      val mx = pairs.map(_._1).sum / m
      val my = pairs.map(_._2).sum / m
      val cov = pairs.map(p => (p._1 - mx) * (p._2 - my)).sum
      val sx = math.sqrt(pairs.map(p => (p._1 - mx) * (p._1 - mx)).sum)
      val sy = math.sqrt(pairs.map(p => (p._2 - my) * (p._2 - my)).sum)
      cov / (sx * sy)
    }
    val want1 = pearson((1 until n).map(i => (revs(i), revs(i - 1))))
    val want7 = pearson((7 until n).map(i => (revs(i), revs(i - 7))))
    val row = StatOps.revenueAcf(spark, d).collect().head
    assert(math.abs(row.getDouble(2) - want1) < 1e-5, "acf1 differential")
    assert(math.abs(row.getDouble(3) - want7) < 1e-5, "acf7 differential")
  }

  test("winsorized daily matches driver-side percent_rank clipping") {
    val n = 90
    val revs = Vector.fill(n)(math.floor(rnd.nextDouble() * 100000) / 100.0)
    val d = java.nio.file.Files.createTempDirectory("winsdiff").toString
    revs.zipWithIndex.map { case (r, i) =>
      (i.toLong, 1L, "O", r, day(i), "A")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    // reference: rank over sorted distinct positions, pr = (rank-1)/(n-1)
    val sorted = revs.sorted
    def rankOf(v: Double) = sorted.indexWhere(_ == v) + 1 // min rank on ties
    val prs = revs.map(v => (v, (rankOf(v) - 1).toDouble / (n - 1)))
    val lo = prs.filter(_._2 <= 0.05).map(_._1).max
    val hi = prs.filter(_._2 >= 0.95).map(_._1).min
    val clipped = revs.map(v => math.min(math.max(v, lo), hi))
    val row = StatOps.winsorizedDaily(spark, d).collect().head
    assert(row.getDouble(2) == lo && row.getDouble(3) == hi, "p05/p95 differential")
    assert(row.getLong(4) == revs.count(v => v < lo || v > hi))
    assert(math.abs(row.getDouble(6) - clipped.sum / n) < 1e-3,
      "winsorized mean differential")
  }

  test("hits matches a driver-side integer fixed-point power iteration") {
    // random bipartite incidence: 40 orders × 25 parts, ~15% density
    val inc = for {
      o <- 1 to 40; p <- 1 to 25 if rnd.nextDouble() < 0.15
    } yield (o.toLong, p.toLong)
    assume(inc.nonEmpty)
    val d = java.nio.file.Files.createTempDirectory("hitsdiff").toString
    inc.zipWithIndex.map { case ((o, p), i) =>
      (o, p, 1L, i + 1, 1.0, 10.0, 0.0, 0.0, "N", "O", day(0))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    // reference: exact Long arithmetic, max-normalized, 3 iterations
    val byOrder = inc.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val byPart = inc.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var auth = byPart.keys.map(_ -> 1000000L).toMap
    for (_ <- 1 to 3) {
      val hubRaw = byOrder.map { case (o, ps) => o -> ps.map(auth).sum }
      val hMax = hubRaw.values.max
      val hub = hubRaw.map { case (o, h) => o -> h * 1000000L / hMax }
      val authRaw = byPart.map { case (p, os) => p -> os.map(hub).sum }
      val aMax = authRaw.values.max
      auth = authRaw.map { case (p, a) => p -> a * 1000000L / aMax }
    }
    val want = auth.toSeq.sortBy { case (p, a) => (-a, p) }.take(20)
      .map { case (p, a) => (p, a.toDouble / 1000000.0) }
    val got = GraphOps.hitsRanking(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(got == want, "hits authority differential (exact integers)")
  }

  test("cusum matches a driver-side scan with midpoint-quantized mean") {
    val n = 60
    val revs = Vector.fill(n)(math.floor(rnd.nextDouble() * 100000) / 100.0)
    val d = java.nio.file.Files.createTempDirectory("cusumdiff").toString
    revs.zipWithIndex.map { case (r, i) =>
      (i.toLong, 1L, "O", r, day(i), "A")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    // reference on cents (exact integers): mean = floor(sum/n·100+0.5)
    val cents = revs.map(r => math.round(r * 100))
    val muCents = math.floor(cents.sum.toDouble / n + 0.5).toLong
    var run = 0L
    var best = (0L, -1) // (|cusum|, day)
    val runs = cents.zipWithIndex.map { case (c, i) =>
      run += c - muCents
      if (math.abs(run) > best._1) best = (math.abs(run), i)
      (i, run)
    }
    val peak = runs(best._2)._2
    val row = StatOps.cusumChangepoint(spark, d).collect().head
    assert(row.getDate(2).toLocalDate ==
      java.time.LocalDate.parse("1995-01-01").plusDays(best._2.toLong),
      "changepoint day differential")
    assert(row.getDouble(3) == peak.toDouble / 100.0, "peak cusum differential")
  }
}
