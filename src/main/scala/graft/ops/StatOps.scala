package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Statistical profiling operators: per-group ordinary least squares
  * (trend extraction), per-group correlation/covariance, and the
  * first-order Markov transition matrix over the event stream — the
  * three "is this signal real" reports an analyst runs after the
  * descriptive aggregates (q01–q24) and before any modeling.
  *
  * Float posture: every statistic here is an algebraic function of
  * pairwise-mergeable moments (Σx, Σy, Σxy, Σx², n) that BOTH engines
  * compute with numerically-stable centered updates (`regr_*`, `corr`,
  * `covar_pop` are ANSI aggregates in Spark and DuckDB alike); results
  * are rounded before comparison so the last-ulp difference from
  * different merge orders cannot flip the hash. Counts stay exact
  * integers throughout.
  */
object StatOps {

  /** q136 — per-brand OLS price trend: slope / intercept / r² of the
    * daily average extended price against the day index, via the ANSI
    * `regr_slope`/`regr_intercept`/`regr_r2` aggregates (one pass,
    * mergeable moment state — the distributed-safe form; an explicit
    * n·Σxy − ΣxΣy assembly would cancel catastrophically at corpus
    * sums this size).
    *
    * Plan: fact⋈part is a broadcast join (part is dim-sized), the
    * (brand, day) pre-aggregation collapses lineitem map-side before
    * the only corpus-keyed exchange, and the regression itself runs on
    * |brands|·|days| rows — bounded by the calendar, not the fact
    * count, so the shape survives any fact-table scale-up unchanged. */
  def priceTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
          .cast("double").as("x"),
        col("l_extendedprice"))
      .groupBy(col("p_brand"), col("x"))
      .agg(avg(col("l_extendedprice")).as("y"))
    daily.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_days"),
        round(regr_slope(col("y"), col("x")), 6).as("slope"),
        round(regr_intercept(col("y"), col("x")), 4).as("intercept"),
        round(regr_r2(col("y"), col("x")), 6).as("r2"))
      .orderBy(col("p_brand"))
  }

  /** q137 — first-order Markov transition matrix over the event
    * stream: for every (event_type → next event_type) step inside a
    * user's timeline, the step count and the row-normalized transition
    * probability. The "what happens after a click" report, and the
    * input to any sequential model of user behavior.
    *
    * Ordering is (ts, event_id) — the event id breaks timestamp ties
    * deterministically, so the lead() is a pure function of the table.
    * Plan: one exchange on user_id (the partitioning every sessionize/
    * funnel query already uses) for the lead window, then a
    * |types|²-row aggregate; the probability window runs on that tiny
    * frame. Event-type cardinality bounds the output, not the corpus. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    steps
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q138 — per-group second-moment profile of the lineitem measures:
    * Pearson correlations, population covariance, and the price
    * standard deviation per return flag. Correlation near 0 between
    * quantity and price is the expected signature of independently
    * drawn synthetic measures — the point of the report is that the
    * VALUE is checked against an independent engine, not assumed.
    *
    * Plan: one partial-aggregated pass over lineitem (moment state is
    * a dozen doubles per group, merged map-side); output rows =
    * |return flags|. Nothing here grows with the fact table. */
  def measureCorr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 6)
          .as("corr_qty_price"),
        round(corr(col("l_extendedprice"), col("l_discount")), 6)
          .as("corr_price_disc"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qty_price"),
        round(stddev_pop(col("l_extendedprice")), 4).as("sd_price"))
      .orderBy(col("l_returnflag"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q136_price_trend"      -> priceTrend,
    "q137_event_transitions" -> eventTransitions,
    "q138_measure_corr"     -> measureCorr)

  val oracleSql: Map[String, String] = Map(
    "q136_price_trend" ->
      """WITH daily AS (SELECT p_brand,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS DOUBLE) AS x,
        |    AVG(l_extendedprice) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  round(regr_slope(y, x), 6) AS slope,
        |  round(regr_intercept(y, x), 4) AS intercept,
        |  round(regr_r2(y, x), 6) AS r2
        |FROM daily GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q137_event_transitions" ->
      """WITH s AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |g AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM g ORDER BY from_type, to_type""".stripMargin,
    "q138_measure_corr" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        |  round(stddev_pop(l_extendedprice), 4) AS sd_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
