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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q25_asof_join"        -> asofJoin,
    "q26_distinct_profile" -> distinctProfile,
    "q27_approx_profile"   -> approxProfile)

  val oracleSql: Map[String, String] = Map(
    "q25_asof_join" ->
      """WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
        |SELECT p.event_id, p.user_id,
        |  epoch_us(p.ts) AS purchase_ts_us,
        |  epoch_us(c.ts) AS click_ts_us
        |FROM p ASOF JOIN c ON p.user_id = c.user_id AND c.ts <= p.ts
        |ORDER BY p.event_id""".stripMargin,
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
