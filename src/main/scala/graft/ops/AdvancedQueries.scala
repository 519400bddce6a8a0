package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Advanced operator surface: as-of join, profiling aggregations.
  *
  * The as-of join — absent in both Spark and the reference — is built
  * from the union+window pattern rather than a custom SparkPlan
  * (SURVEY.md §7.3 preference order (a): compose built-ins first): tag
  * both sides, union, and carry the last left-side value forward with a
  * running `last(..., ignoreNulls)` window. One shuffle on the join key,
  * no range explosion, works at any scale; DuckDB's native ASOF JOIN is
  * the oracle.
  */
object AdvancedQueries {

  /** For each purchase event, the user's most recent prior (ts ≤) click:
    * timestamps exported as epoch micros (both engines truncate nanos
    * the same way). */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    // clicks sort before purchases at equal ts so an exactly-simultaneous
    // click is visible to the purchase (ASOF's <= semantics)
    val isPurchase = when(col("event_type") === "purchase", 1).otherwise(0)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), isPurchase, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_ts",
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase" && col("last_click_ts").isNotNull)
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("purchase_ts_us"),
        unix_micros(col("last_click_ts")).as("click_ts_us"))
      .orderBy("event_id")
  }

  /** Column profiling with exact distincts — the schema-audit pass before
    * heavy jobs. (count(distinct) here is the oracle-checkable twin of
    * the approx profile below.) */
  def distinctProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_orderkey")).as("n_orders"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_suppliers"),
      countDistinct(col("l_returnflag"), col("l_linestatus")).as("n_flag_combos"),
      min(col("l_quantity")).as("min_qty"),
      max(col("l_quantity")).as("max_qty"))

  /** The 100 TB version of the same profile: HLL++ approx distincts and
    * approximate quantiles — single pass, bounded memory, no exact
    * shuffle of every distinct value. Engine-specific sketches → no SQL
    * oracle (driver rows-only); accuracy pinned in AdvancedSpec against
    * the exact profile. */
  def approxProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col("l_orderkey")).as("n_orders_approx"),
      approx_count_distinct(col("l_partkey")).as("n_parts_approx"),
      approx_count_distinct(col("l_suppkey")).as("n_suppliers_approx"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("p50_price"),
      percentile_approx(col("l_extendedprice"), lit(0.99), lit(10000)).as("p99_price"))

  /** Batch sessionization via the islands pattern: lag → gap flag →
    * running sum as session id → per-session aggregates. Two windows and
    * one aggregation, all partitioned on user_id (a single shuffle);
    * the streaming equivalents live in streaming.StreamOps. 30-minute
    * gap, timestamps as epoch micros for cross-engine parity. */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(wRun))
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("user_id", "session_id")
  }

  /** Range (theta) join: classify events into non-uniform value bands.
    * The band table is tiny and broadcast, so the non-equi predicate
    * costs one broadcast-nested-loop pass over the fact — the correct
    * physical shape when the range dim is small. (A large range dim
    * would first be binned to an equi key; that path is the
    * hyperplane/banding pattern used by the LSH operators.) */
  def rangeJoinBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bands = Seq(
      ("micro", 0.0, 10.0), ("small", 10.0, 25.0), ("medium", 25.0, 75.0),
      ("large", 75.0, 150.0), ("huge", 150.0, 1e12))
      .toDF("band", "lo", "hi")
    t(s, dir, "events")
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("band")
  }

  /** Recency dedup: the latest event per user (ingest compaction /
    * changelog upsert semantics). One shuffle on user_id; ties broken by
    * event_id so the survivor is total-ordered. */
  def latestPerUser(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    t(s, dir, "events")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
      .orderBy("user_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_latest_per_user"  -> latestPerUser,
    "q39_range_join_bands" -> rangeJoinBands,
    "q25_asof_join"        -> asofJoin,
    "q26_distinct_profile" -> distinctProfile,
    "q27_approx_profile"   -> approxProfile,
    "q47_sessionize"       -> sessionize)

  val oracleSql: Map[String, String] = Map(
    "q56_latest_per_user" ->
      """SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us, value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |        ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn FROM events)
        |WHERE rn = 1
        |ORDER BY user_id""".stripMargin,
    "q39_range_join_bands" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('micro', 0.0, 10.0), ('small', 10.0, 25.0), ('medium', 25.0, 75.0),
        |  ('large', 75.0, 150.0), ('huge', 150.0, 1e12))
        |SELECT band, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM events JOIN bands ON value >= lo AND value < hi
        |GROUP BY band ORDER BY band""".stripMargin,
    "q25_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_ts_us,
        |  epoch_us(c.ts) AS click_ts_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
    "q47_sessionize" ->
      """WITH e AS (
        |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, value FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, ts_us, value,
        |    CASE WHEN lag(ts_us) OVER w IS NULL
        |           OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT user_id, ts_us, value,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id,
        |  MIN(ts_us) AS session_start_us,
        |  MAX(ts_us) AS session_end_us,
        |  COUNT(*) AS n_events,
        |  ROUND(SUM(value), 2) AS total_value
        |FROM sess GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q26_distinct_profile" ->
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(DISTINCT l_orderkey) AS n_orders,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_suppliers,
        |  COUNT(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_combos,
        |  MIN(l_quantity) AS min_qty,
        |  MAX(l_quantity) AS max_qty
        |FROM lineitem""".stripMargin)
}
