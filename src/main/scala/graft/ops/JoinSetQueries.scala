package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Join-breadth + set-operation operators.
  *
  * The reference only ever uses equi inner joins (SURVEY.md §2.3 verifies
  * outer/semi/anti and set ops are absent); a complete engine needs them,
  * so they are first-class here. All joins are declared logically and left
  * to Catalyst/AQE for strategy: at testdata scale the dim side broadcasts,
  * at 100 TB the same plan degrades gracefully to shuffled hash join.
  * Semi/anti joins ship only the join key columns over the wire — the
  * right-hand projection below keeps the shuffle narrow.
  */
object JoinSetQueries {

  /** Left outer join + count-preserving aggregation: order activity per
    * customer, keeping customers with no orders (count=0). */
  def ordersPerCustomer(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_name"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(round(sum(col("o_totalprice")), 2), lit(0.0)).as("total_spent"))
      .orderBy("c_custkey")
  }

  /** Left semi join (EXISTS): customers with at least one urgent order.
    * Only o_custkey crosses the shuffle — the filter and projection are
    * pushed below the join. */
  def urgentCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val urgent = t(s, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_custkey")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left anti join (NOT EXISTS): customers with no orders at all. */
  def idleCustomers(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val o = t(s, dir, "orders").select("o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** UNION (distinct): nations that have customers or suppliers. */
  def unionNations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .union(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .distinct()
      .orderBy("nationkey")

  /** INTERSECT: nations with both customers and suppliers. */
  def intersectNations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** EXCEPT: nations with customers but no suppliers. */
  def exceptNations(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(t(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  /** ROLLUP hierarchy totals (region → nation → grand total). Subtotal
    * rows carry NULL group keys in both engines; sort pins NULLS FIRST
    * explicitly because Spark and DuckDB default differently. */
  def regionRollup(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val n = t(s, dir, "nation")
    val r = t(s, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name").as("region_name"), col("n_name").as("nation_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        round(sum(col("c_acctbal")), 2).as("total_balance"))
      .orderBy(asc_nulls_first("region_name"), asc_nulls_first("nation_name"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_orders_per_customer" -> ordersPerCustomer,
    "q15_semi_urgent"         -> urgentCustomers,
    "q16_anti_idle"           -> idleCustomers,
    "q17_union_nations"       -> unionNations,
    "q18_intersect_nations"   -> intersectNations,
    "q19_except_nations"      -> exceptNations,
    "q20_region_rollup"       -> regionRollup)

  val oracleSql: Map[String, String] = Map(
    "q14_orders_per_customer" ->
      """SELECT c_custkey, c_name,
        |  COUNT(o_orderkey) AS n_orders,
        |  COALESCE(ROUND(SUM(o_totalprice), 2), 0.0) AS total_spent
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey, c_name
        |ORDER BY c_custkey""".stripMargin,
    "q15_semi_urgent" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q16_anti_idle" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "q17_union_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q18_intersect_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q19_except_nations" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "q20_region_rollup" ->
      """SELECT r_name AS region_name, n_name AS nation_name,
        |  COUNT(*) AS n_customers,
        |  ROUND(SUM(c_acctbal), 2) AS total_balance
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY region_name ASC NULLS FIRST, nation_name ASC NULLS FIRST""".stripMargin)
}
