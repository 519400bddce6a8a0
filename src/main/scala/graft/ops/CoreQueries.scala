package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Core parity operators (SURVEY.md §2.1–2.7) re-expressed over the driver's
  * TPC-H-ish fixtures.
  *
  * Each query mirrors one reference pipeline stage (cited per query) but is
  * built Spark-first: declarative DataFrame plans so Catalyst pushes filters
  * into the parquet scan, prunes columns, and picks join strategies.
  * Bounded-cardinality dims (nation=25, region=5) get explicit `broadcast`
  * hints; data-scaled tables (customer, part, orders) are left to
  * AQE/auto-broadcast so the same plan is valid at 100 TB where they no
  * longer fit in an executor.
  */
object CoreQueries {

  /** Flagship — reference gold mart `dm_faction_economy`
    * (gold_aggregator.py:27-48): fact ⋈ customer-dim ⋈ faction-dim,
    * conditional SUM(CASE) pivot, COUNT(*), ROUND post-agg, sort by net.
    * Star-schema roles: lineitem=fact_sales, customer=dim_customer,
    * nation=dim_faction, l_returnflag∈{N,R}=transaction_type∈{BUY,SELL}.
    */
  def factionEconomy(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o  = t(s, dir, "orders")
    val c  = t(s, dir, "customer")
    val n  = t(s, dir, "nation")
    val sumIf = (flag: String) =>
      sum(when(col("l_returnflag") === flag, col("l_extendedprice")).otherwise(lit(0.0)))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name").as("nation_name"))
      .agg(
        round(sumIf("N"), 2).as("gold_in"),
        round(sumIf("R"), 2).as("gold_out"),
        round(sumIf("N") - sumIf("R"), 2).as("net_gold"),
        count(lit(1)).as("trades"))
      .orderBy(col("net_gold").desc, col("nation_name"))
  }

  /** Reference gold mart `dm_resource_price_history`
    * (gold_aggregator.py:56-75): 4-way join, category filter, monthly
    * AVG/SUM per product, multi-key ascending sort. p_type='STANDARD'
    * stands in for category_name='Resources'. */
  def priceHistory(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p  = t(s, dir, "part")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .filter(col("p_type") === "STANDARD")
      .groupBy(
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"),
        col("p_name").as("product_name"))
      .agg(
        // Oracle-parity note: round(avg(double), 2) diverges between engines
        // at exact half-way values (Spark rounds the shortest decimal repr,
        // DuckDB the scaled binary). Cents-grid money summed as exact
        // DECIMAL then divided gives a bit-identical double in both.
        (sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("avg_price"),
        round(sum(col("l_quantity")), 2).as("total_quantity"))
      .orderBy(col("year"), col("month"), col("product_name"))
  }

  /** Reference gold mart `dm_top_vip_customers` (gold_aggregator.py:83-101):
    * segment + transaction-type filter, per-customer COUNT/SUM, top-k.
    * c_mktsegment='BUILDING' stands in for customer_segment='VIP';
    * l_returnflag='N' for transaction_type='BUY'. Spark plans the
    * orderBy+limit as TakeOrderedAndProject (no global sort shuffle). */
  def topCustomers(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val o  = t(s, dir, "orders")
    val c  = t(s, dir, "customer")
    val n  = t(s, dir, "nation")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .filter(col("c_mktsegment") === "BUILDING" && col("l_returnflag") === "N")
      .groupBy(col("c_name").as("customer_name"), col("n_name").as("nation_name"))
      .agg(
        count(col("l_orderkey")).as("trades"),
        round(sum(col("l_extendedprice")), 2).as("total_spent"))
      .orderBy(col("total_spent").desc, col("customer_name"))
      .limit(100)
  }

  /** Reference gold mart `dm_artifact_sales_summary`
    * (gold_aggregator.py:108-125): category filter, group by product+tier,
    * two-key mixed-direction sort. p_type='PROMO' stands in for
    * category_name='Artifacts', p_brand for tier_level. */
  def artifactSummary(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p  = t(s, dir, "part")
    li.join(p, li("l_partkey") === p("p_partkey"))
      .filter(col("p_type") === "PROMO")
      .groupBy(col("p_name").as("product_name"), col("p_brand").as("tier_level"))
      .agg(
        count(col("l_orderkey")).as("trades"),
        round(sum(col("l_quantity")), 2).as("total_sold"),
        round(sum(col("l_extendedprice")), 2).as("total_value"))
      .orderBy(col("total_sold").asc, col("total_value").desc, col("product_name"))
  }

  /** Silver cleaning (silver_processor.py:38-43): null-drop on key subset
    * (P1) + inequality filter (P2) + projection. Both predicates reach the
    * parquet scan as PushedFilters. */
  def cleanFilter(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .na.drop(Seq("l_orderkey", "l_partkey", "l_suppkey"))
      .filter(col("l_quantity") =!= 0)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .orderBy("l_orderkey", "l_linenumber")

  /** Silver enrichment (silver_processor.py:47-50): conditional derived
    * boolean column (P3, `is_hero`). */
  def derivedFlag(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        col("c_name"),
        (col("c_mktsegment") === "BUILDING").as("is_vip"))
      .orderBy("c_custkey")

  /** Silver dedup (silver_processor.py:47,53-64, D1/D2) made deterministic:
    * keep the lowest-key row per group, instead of dropDuplicates'
    * arbitrary-row semantics (which cannot be oracle-checked). An argmin
    * via min-over-struct (lexicographic, key first and unique) rather
    * than a rank window: the aggregate combines map-side, so one row per
    * group per input partition crosses the exchange — a
    * `partitionBy(c_nationkey)` window would instead sort each nation's
    * whole customer list in one task (the PlanAuditSpec class). */
  def dedupFirstPerKey(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(min(struct(col("c_custkey"), col("c_name"))).as("__first"))
      .select(col("c_nationkey"), col("__first.c_custkey").as("c_custkey"),
        col("__first.c_name").as("c_name"))
      .orderBy("c_nationkey")

  /** DISTINCT projection + ordinal sort (main.py:304, D3/O5). */
  def distinctFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  /** Date-dimension generator source (bronze_generator.py:38-61, S4):
    * a parallel `sequence()` range instead of a driver loop. Replicates
    * pandas day-of-week numbering (0=Mon..6=Sun; Spark's dayofweek is
    * 1=Sun) and the y*10000+m*100+d smart key. */
  def dateDim(s: SparkSession, dir: String): DataFrame = {
    val d = s.sql(
      "SELECT explode(sequence(to_date('2000-01-01'), to_date('2001-12-31'))) AS d")
    val dow = (dayofweek(col("d")) + lit(5)) % 7
    d.select(
        (year(col("d")) * 10000 + month(col("d")) * 100 + dayofmonth(col("d"))).as("date_key"),
        format_string("%04d-%02d-%02d", year(col("d")), month(col("d")), dayofmonth(col("d"))).as("date_str"),
        dow.as("day_of_week"),
        month(col("d")).as("month"),
        year(col("d")).as("year"),
        dow.isin(5, 6).as("is_weekend"))
      .orderBy("date_key")
  }

  /** Membership predicate (bronze_generator.py:49, P7) + grouped agg over
    * the events table. */
  def eventFunnel(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .filter(col("event_type").isin("click", "view", "purchase"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("total_value"))
      .orderBy("event_type")

  /** Ungrouped scalar COUNT(*) — the silver verification probe
    * (silver_processor.py:88-93, A8/S10). */
  def totalCount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem").agg(count(lit(1)).as("cnt"))

  /** Scalar-function surface (§2.7 table): smart date key arithmetic,
    * zero-padded string formatting, ROUND, CASE WHEN. */
  def scalarFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        (year(col("o_orderdate")) * 10000 + month(col("o_orderdate")) * 100
          + dayofmonth(col("o_orderdate"))).as("date_key"),
        format_string("%04d-%02d-%02d",
          year(col("o_orderdate")), month(col("o_orderdate")),
          dayofmonth(col("o_orderdate"))).as("date_str"),
        // x/3 can never land exactly half-way at 2 decimals (20m = 600j+3
        // has no integer solution), so both engines' ROUND agree.
        round(col("o_totalprice") / 3.0, 2).as("fee"),
        when(col("o_orderpriority") === "1-URGENT", "urgent")
          .otherwise("normal").as("priority_flag"))
      .orderBy("o_orderkey")

  /** Multi-column rollup through two dim joins (J1 shape + A4/A6):
    * region⋈nation⋈customer with AVG per (region, nation). */
  def regionNationStats(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        (sum(col("c_acctbal").cast("decimal(18,2)")).cast("double")
          / count(lit(1))).as("avg_balance"))
      .orderBy("region_name", "nation_name")
  }

  /** Parameterized drill-down (P5; reference main.py:326-327, surfaced
    * in-warehouse by [[graft.erathia.Viewer.priceDrilldown]]): the
    * price-history mart restricted to ONE user-chosen product,
    * chronological. Composed as mart-then-filter so the binding stays a
    * typed Column literal (never string-spliced SQL) and Catalyst pushes
    * the product predicate through the sort and aggregate into the part
    * scan (PushedFilters: p_name) — at 100 TB the drill-down reads one
    * product's slice, not the materialized mart. The catalog entry q175
    * binds 'blue anvil' (present at every test SF) for the oracle. */
  def priceDrilldown(s: SparkSession, dir: String, product: String): DataFrame =
    priceHistory(s, dir).filter(col("product_name") === product)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_param_drilldown"  -> ((s, dir) => priceDrilldown(s, dir, "blue anvil")),
    "q01_faction_economy"   -> factionEconomy,
    "q02_price_history"     -> priceHistory,
    "q03_top_customers"     -> topCustomers,
    "q04_artifact_summary"  -> artifactSummary,
    "q05_clean_filter"      -> cleanFilter,
    "q06_derived_flag"      -> derivedFlag,
    "q07_dedup_first_per_key" -> dedupFirstPerKey,
    "q08_distinct_flags"    -> distinctFlags,
    "q09_date_dim"          -> dateDim,
    "q10_event_funnel"      -> eventFunnel,
    "q11_total_count"       -> totalCount,
    "q12_scalar_funcs"      -> scalarFuncs,
    "q13_region_nation_stats" -> regionNationStats)

  val oracleSql: Map[String, String] = Map(
    "q01_faction_economy" ->
      """SELECT n_name AS nation_name,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END), 2) AS gold_in,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS gold_out,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END)
        |      - SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS net_gold,
        |  COUNT(*) AS trades
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |GROUP BY n_name
        |ORDER BY net_gold DESC, nation_name""".stripMargin,
    "q02_price_history" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
        |  CAST(month(l_shipdate) AS INTEGER) AS month,
        |  p_name AS product_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  ROUND(SUM(l_quantity), 2) AS total_quantity
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'STANDARD'
        |GROUP BY 1, 2, 3
        |ORDER BY year, month, product_name""".stripMargin,
    "q175_param_drilldown" ->
      """SELECT CAST(year(l_shipdate) AS INTEGER) AS year,
        |  CAST(month(l_shipdate) AS INTEGER) AS month,
        |  p_name AS product_name,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  ROUND(SUM(l_quantity), 2) AS total_quantity
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'STANDARD' AND p_name = 'blue anvil'
        |GROUP BY 1, 2, 3
        |ORDER BY year, month""".stripMargin,
    "q03_top_customers" ->
      """SELECT c_name AS customer_name, n_name AS nation_name,
        |  COUNT(l_orderkey) AS trades,
        |  ROUND(SUM(l_extendedprice), 2) AS total_spent
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |WHERE c_mktsegment = 'BUILDING' AND l_returnflag = 'N'
        |GROUP BY c_name, n_name
        |ORDER BY total_spent DESC, customer_name
        |LIMIT 100""".stripMargin,
    "q04_artifact_summary" ->
      """SELECT p_name AS product_name, p_brand AS tier_level,
        |  COUNT(l_orderkey) AS trades,
        |  ROUND(SUM(l_quantity), 2) AS total_sold,
        |  ROUND(SUM(l_extendedprice), 2) AS total_value
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_type = 'PROMO'
        |GROUP BY p_name, p_brand
        |ORDER BY total_sold ASC, total_value DESC, product_name""".stripMargin,
    "q05_clean_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        |FROM lineitem
        |WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
        |  AND l_suppkey IS NOT NULL AND l_quantity <> 0
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "q06_derived_flag" ->
      """SELECT c_custkey, c_name, c_mktsegment = 'BUILDING' AS is_vip
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q07_dedup_first_per_key" ->
      """SELECT c_nationkey, c_custkey, c_name FROM (
        |  SELECT c_nationkey, c_custkey, c_name,
        |    row_number() OVER (PARTITION BY c_nationkey ORDER BY c_custkey) AS rn
        |  FROM customer) WHERE rn = 1
        |ORDER BY c_nationkey""".stripMargin,
    "q08_distinct_flags" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q09_date_dim" ->
      """SELECT CAST(year(d)*10000 + month(d)*100 + day(d) AS INTEGER) AS date_key,
        |  printf('%04d-%02d-%02d', year(d), month(d), day(d)) AS date_str,
        |  CAST(isodow(d) - 1 AS INTEGER) AS day_of_week,
        |  CAST(month(d) AS INTEGER) AS month,
        |  CAST(year(d) AS INTEGER) AS year,
        |  isodow(d) - 1 IN (5, 6) AS is_weekend
        |FROM (SELECT CAST(unnest(generate_series(DATE '2000-01-01', DATE '2001-12-31', INTERVAL 1 DAY)) AS DATE) AS d)
        |ORDER BY date_key""".stripMargin,
    "q10_event_funnel" ->
      """SELECT event_type, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
        |FROM events
        |WHERE event_type IN ('click', 'view', 'purchase')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q11_total_count" ->
      "SELECT COUNT(*) AS cnt FROM lineitem",
    "q12_scalar_funcs" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate)*10000 + month(o_orderdate)*100 + day(o_orderdate) AS INTEGER) AS date_key,
        |  printf('%04d-%02d-%02d', year(o_orderdate), month(o_orderdate), day(o_orderdate)) AS date_str,
        |  ROUND(o_totalprice / 3.0, 2) AS fee,
        |  CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' ELSE 'normal' END AS priority_flag
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q13_region_nation_stats" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY region_name, nation_name""".stripMargin)
}
