package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Reshaping + scalar-function breadth: PIVOT (the first-class form of
  * the reference's SUM(CASE WHEN) marts), CUBE, and the string/null
  * scalar surface.
  */
object ShapeQueries {

  /** PIVOT on return flag: quantity totals per (linestatus × flag).
    * Explicit pivot values keep the plan a single pass (no distinct-scan
    * to discover columns — required at scale). Bench note: like q38,
    * one-shot wall time is codegen-compile-bound (8.0 s first execution,
    * 1.1 s identical re-run at sf0.1) — a constant, not data volume. */
  def pivotFlags(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus").as("linestatus"))
      .pivot("l_returnflag", Seq("N", "A", "R"))
      .agg(round(sum(col("l_quantity")), 2))
      .orderBy("linestatus")

  /** CUBE over (region, nation): all four grouping combinations in one
    * pass. */
  def regionCube(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .cube(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(asc_nulls_first("region_name"), asc_nulls_first("nation_name"))
  }

  /** String + null-handling scalar surface over part.
    *
    * Bench note: this query's one-shot wall time is dominated by
    * whole-stage-codegen compilation of the 10-expression string
    * projection (measured: 4.0 s first execution, 0.70 s re-execution of
    * the identical plan at sf0.1; per-column runs are 0.2–0.4 s each).
    * That Janino compile is a constant, not a function of data volume —
    * at 100 TB it amortizes to nothing, and no per-row work here is
    * superlinear (verified column-by-column). */
  def stringFuncs(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("upper_name"),
        lower(col("p_type")).as("lower_type"),
        substring(col("p_name"), 1, 5).as("prefix5"),
        regexp_replace(col("p_name"), " ", "_").as("snake_name"),
        lpad(col("p_brand"), 10, "*").as("brand_padded"),
        length(col("p_name")).as("name_len"),
        reverse(col("p_type")).as("type_rev"),
        coalesce(nullif(col("p_size"), lit(0)), lit(-1)).as("size_or_default"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy("p_partkey")

  /** Explicit GROUPING SETS — independent aggregation shapes in one
    * pass (per-returnflag totals and per-linestatus totals, but not the
    * cross product that CUBE would compute). */
  def groupingSets(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("li_gs")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS n_rows,
        |  ROUND(SUM(l_extendedprice), 2) AS total_price
        |FROM li_gs
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  /** Pure-SQL CTE pipeline over registered views — the reference's gold
    * stage is exactly this shape (CTE + pivot-by-CASE + sort,
    * gold_aggregator.py:27-48); Catalyst inlines the CTE and plans the
    * same broadcast-join + hash-agg as the DataFrame form. */
  def cteSql(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.registerAll(s, dir)
    s.sql(
      """WITH nation_sales AS (
        |  SELECT n_name, l_returnflag, l_extendedprice
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey)
        |SELECT n_name AS nation_name,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END), 2) AS gold_in,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS gold_out,
        |  COUNT(*) AS trades
        |FROM nation_sales
        |GROUP BY n_name
        |ORDER BY nation_name""".stripMargin)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q59_cte_sql"      -> cteSql,
    "q28_pivot_flags"  -> pivotFlags,
    "q29_region_cube"  -> regionCube,
    "q38_string_funcs" -> stringFuncs,
    "q58_grouping_sets" -> groupingSets)

  val oracleSql: Map[String, String] = Map(
    "q59_cte_sql" ->
      """WITH nation_sales AS (
        |  SELECT n_name, l_returnflag, l_extendedprice
        |  FROM lineitem
        |  JOIN orders   ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation   ON c_nationkey = n_nationkey)
        |SELECT n_name AS nation_name,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_extendedprice ELSE 0 END), 2) AS gold_in,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_extendedprice ELSE 0 END), 2) AS gold_out,
        |  COUNT(*) AS trades
        |FROM nation_sales
        |GROUP BY n_name
        |ORDER BY nation_name""".stripMargin,
    "q58_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  COUNT(*) AS n_rows,
        |  ROUND(SUM(l_extendedprice), 2) AS total_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q28_pivot_flags" ->
      """SELECT l_linestatus AS linestatus,
        |  ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
        |  ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
        |  ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
        |FROM lineitem GROUP BY l_linestatus ORDER BY linestatus""".stripMargin,
    "q29_region_cube" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  COUNT(*) AS n_customers
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST""".stripMargin,
    "q38_string_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS upper_name,
        |  lower(p_type) AS lower_type,
        |  substring(p_name, 1, 5) AS prefix5,
        |  replace(p_name, ' ', '_') AS snake_name,
        |  lpad(p_brand, 10, '*') AS brand_padded,
        |  CAST(length(p_name) AS INTEGER) AS name_len,
        |  reverse(p_type) AS type_rev,
        |  COALESCE(NULLIF(p_size, 0), -1) AS size_or_default,
        |  concat_ws('|', p_brand, p_type) AS brand_type
        |FROM part ORDER BY p_partkey""".stripMargin)
}
