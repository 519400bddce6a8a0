package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TimeSeriesOps

/** Value-level checks for the round-4 time-series operators (q104–q105);
  * the DuckDB oracle pins them on the driver tables. */
class TimeSeriesSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("price gapfill: dense grid, observed days keep their price, gaps carry forward") {
    val rows = TimeSeriesOps.priceGapfill(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        Option(r.get(2)).map(_.asInstanceOf[Double]),
        r.getDouble(3), r.getBoolean(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (part, xs) =>
      val days = xs.map(_._2).sorted
      // dense: one row per calendar day across the span
      assert(days.length ==
        java.time.temporal.ChronoUnit.DAYS.between(days.head, days.last) + 1,
        s"part $part grid has gaps")
      // first day of the span is an observation by construction
      val first = xs.minBy(_._2)
      assert(first._3.isDefined && !first._5)
      // forward fill: every row's filled price is the last observed price
      var last = Double.NaN
      xs.sortBy(_._2).foreach { case (_, _, obs, filled, isFilled) =>
        obs match {
          case Some(p) =>
            assert(!isFilled && filled == p); last = p
          case None =>
            assert(isFilled && filled == last,
              s"gap day must carry the previous observation forward")
        }
      }
    }
  }

  test("ordered funnel counts only strictly-sequenced progressions") {
    val d = java.nio.file.Files.createTempDirectory("funnel").toString
    def ns(day: Int): Long = (19723L + day) * 86400L * 1000000000L
    // user 1: view < click < purchase (full funnel)
    // user 2: click BEFORE view, none after → view stage only
    // user 3: purchase BEFORE click → view+click only
    // user 4: never views → not counted anywhere
    val ev = Seq(
      (1L, ns(0), 1L, "view"), (2L, ns(1), 1L, "click"), (3L, ns(2), 1L, "purchase"),
      (4L, ns(0), 2L, "click"), (5L, ns(1), 2L, "view"),
      (6L, ns(0), 3L, "view"), (7L, ns(0), 3L, "purchase"), (8L, ns(1), 3L, "click"),
      (9L, ns(0), 4L, "click"), (10L, ns(1), 4L, "purchase"))
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") })
    val r = TimeSeriesOps.orderedFunnel(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("ltv cohorts accumulate exact revenue per cohort age") {
    val d = java.nio.file.Files.createTempDirectory("ltv").toString
    def day(ym: Int) = java.time.LocalDateTime
      .parse("1995-01-01T00:00:00").plusMonths(ym.toLong)
    // cohort M0: cust 1 spends 100 in m0 and 50 in m2; cust 2 spends
    // 200 in m0. cohort M1: cust 3 spends 10 in m1.
    val rows = Seq(
      (1L, 1L, 100.0, day(0)), (2L, 2L, 200.0, day(0)),
      (3L, 1L, 50.0, day(2)), (4L, 3L, 10.0, day(1)))
    rows.map { case (ok, ck, p, dt) => (ok, ck, "F", p, dt, "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = TimeSeriesOps.ltvCohorts(spark, d).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getDouble(4), x.getDouble(5),
          x.getDouble(6)))).toMap
    val m0 = 1995 * 12 + 0
    assert(r((m0, 0L)) == ((2L, 2L, 300.0, 300.0, 150.0)))
    assert(r((m0, 2L)) == ((1L, 2L, 50.0, 350.0, 175.0)),
      "cumulative revenue spans the gap month; LTV divides by cohort size")
    assert(r((m0 + 1, 0L)) == ((1L, 1L, 10.0, 10.0, 10.0)))
    assert(!r.contains((m0, 1L)), "no cell for a month with no orders")
  }

  test("windowed funnel drops steps that land outside 7 days") {
    val d = java.nio.file.Files.createTempDirectory("wfun").toString
    def ns(day: Int): Long = (19723L + day) * 86400L * 1000000000L
    // user 1 converts fully inside the windows; user 2's click is a
    // month late; user 3's purchase is 19 days after the click.
    val ev = Seq(
      (1L, ns(0), 1L, "view"), (2L, ns(1), 1L, "click"), (3L, ns(2), 1L, "purchase"),
      (4L, ns(0), 2L, "view"), (5L, ns(30), 2L, "click"),
      (6L, ns(0), 3L, "view"), (7L, ns(1), 3L, "click"), (8L, ns(20), 3L, "purchase"))
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u, ty) => (id, t, u, ty, 1.0, "{}") })
    val r = TimeSeriesOps.windowedFunnel(spark, d).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 1L)))
  }

  test("seasonal index is exact on a two-week weekday-spiked series") {
    val d = java.nio.file.Files.createTempDirectory("seas").toString
    def day(i: Int) = java.time.LocalDateTime
      .parse("1992-01-06T00:00:00").plusDays(i.toLong) // a Monday
    // 14 consecutive days, Mondays at 200, everything else 100.
    val rows = (0 until 14).map { i =>
      (i.toLong, 1L, "O", if (i % 7 == 0) 200.0 else 100.0, day(i), "A")
    }
    rows.toDF("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/orders.parquet")
    val r = TimeSeriesOps.seasonalIndex(spark, d).collect()
      .map(x => x.getInt(1) -> ((x.getLong(2), x.getDouble(3), x.getDouble(4))))
      .toMap
    val overall = 1600.0 / 14
    assert(r(0) == ((2L, 200.0, math.rint(200.0 / overall * 1e6) / 1e6)))
    assert(r(1) == ((2L, 100.0, math.rint(100.0 / overall * 1e6) / 1e6)))
    assert(r.keySet == (0 to 6).toSet)
  }

  test("cohort retention on a hand-built event stream") {
    val d = java.nio.file.Files.createTempDirectory("cohort").toString
    def ns(week: Int, day: Int = 0): Long =
      (19723L + week * 7 + day) * 86400L * 1000000000L // 2024-01-01 epoch day
    // user 1: weeks 0,1,3; user 2: week 0; user 3: weeks 1,2
    val ev = Seq(
      (1L, ns(0), 1L), (2L, ns(0, 1), 1L), (3L, ns(1), 1L), (4L, ns(3), 1L),
      (5L, ns(0, 2), 2L),
      (6L, ns(1, 4), 3L), (7L, ns(2), 3L))
    TestFixtures.writeEvents(spark, d,
      ev.map { case (id, t, u) => (id, t, u, "click", 1.0, "{}") })
    val r = TimeSeriesOps.cohortRetention(spark, d).collect()
      .map(x => ((x.getLong(0), x.getLong(1)),
        (x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r == Map(
      (0L, 0L) -> ((2L, 2L, 1.0)),   // users 1,2 start in week 0
      (0L, 1L) -> ((1L, 2L, 0.5)),   // user 1 active in week 1
      (0L, 3L) -> ((1L, 2L, 0.5)),   // user 1 active in week 3
      (1L, 0L) -> ((1L, 1L, 1.0)),   // user 3 starts in week 1
      (1L, 1L) -> ((1L, 1L, 1.0)))) // user 3 active in week 2
  }
}
