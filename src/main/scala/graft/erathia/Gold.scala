package graft.erathia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gold layer: the four data marts of
  * /root/reference/src/gold_aggregator.py:27-125, re-expressed as
  * DataFrame pipelines over the silver temp views (no DuckDB hop — see
  * Silver). Column aliases keep the reference's quoted friendly names so
  * report output is drop-in identical.
  *
  * Every mart is scan → broadcast-joins → filter → hash-agg → sort
  * [→ limit]; dims are broadcast (≤368 rows), the only shuffle is the
  * aggregation exchange, and AQE coalesces its partitions. ROUND lands
  * post-aggregation exactly where the reference rounds.
  */
object Gold {

  /** dm_faction_economy (gold_aggregator.py:27-48). */
  def factionEconomy(s: SparkSession): DataFrame = {
    val buy = sum(when(col("transaction_type") === "BUY", col("gold_total")).otherwise(0.0))
    val sell = sum(when(col("transaction_type") === "SELL", col("gold_total")).otherwise(0.0))
    s.table("fact_sales")
      .join(broadcast(s.table("dim_customer")), Seq("customer_key"))
      .join(broadcast(s.table("dim_faction")), Seq("faction_key"))
      .groupBy(col("faction_name").as("Faction"))
      .agg(
        round(buy, 2).as("Total Buy Volume (Gold)"),
        round(sell, 2).as("Total Sell Volume (Gold)"),
        round(sell - buy, 2).as("Net Profit"),
        count(lit(1)).as("Transactions"))
      .orderBy(col("Net Profit").desc)
  }

  /** dm_resource_price_history (gold_aggregator.py:56-75). */
  def resourcePriceHistory(s: SparkSession): DataFrame =
    s.table("fact_sales")
      .join(broadcast(s.table("dim_product")), Seq("product_key"))
      .join(broadcast(s.table("dim_product_category")), Seq("category_key"))
      .join(broadcast(s.table("dim_date")), Seq("date_key"))
      .filter(col("category_name") === "Resources")
      .groupBy(
        s.table("dim_date")("year").as("Year"),
        s.table("dim_date")("month").as("Month"),
        col("product_name").as("Resource Name"))
      .agg(
        round(avg(col("gold_per_unit")), 2).as("Avg Price (Gold)"),
        round(sum(col("quantity")), 2).as("Total Quantity Traded"))
      .orderBy(col("Year"), col("Month"), col("Resource Name"))

  /** dm_top_vip_customers (gold_aggregator.py:83-101). */
  def topVipCustomers(s: SparkSession): DataFrame =
    s.table("fact_sales")
      .join(broadcast(s.table("dim_customer")), Seq("customer_key"))
      .join(broadcast(s.table("dim_faction")), Seq("faction_key"))
      .filter(col("customer_segment") === "VIP" && col("transaction_type") === "BUY")
      .groupBy(col("customer_name").as("Customer"), col("faction_name").as("Faction"))
      .agg(
        count(col("trade_key")).as("Transactions"),
        round(sum(col("gold_total")), 2).as("Total Spent (Gold)"))
      .orderBy(col("Total Spent (Gold)").desc)
      .limit(100)

  /** dm_artifact_trade_summary (gold_aggregator.py:108-125). */
  def artifactTradeSummary(s: SparkSession): DataFrame =
    s.table("fact_sales")
      .join(broadcast(s.table("dim_product")), Seq("product_key"))
      .join(broadcast(s.table("dim_product_category")), Seq("category_key"))
      .filter(col("category_name") === "Artifacts")
      .groupBy(col("product_name").as("Artifact"), col("tier_level").as("Tier"))
      .agg(
        count(col("trade_key")).as("Times Traded"),
        round(sum(col("quantity")), 2).as("Total Sold"),
        round(sum(col("gold_total")), 2).as("Total Gold Value"))
      .orderBy(col("Total Sold").asc, col("Total Gold Value").desc)

  /** SQL twins (the reference's gold stage is SQL; both forms are
    * first-class — gold_aggregator.py keeps these as CTAS statements). */
  val sql: Map[String, String] = Map(
    "dm_faction_economy" ->
      """WITH faction_sales AS (
        |  SELECT f.faction_name, s.transaction_type, s.gold_total
        |  FROM fact_sales s
        |  JOIN dim_customer c ON s.customer_key = c.customer_key
        |  JOIN dim_faction f ON c.faction_key = f.faction_key)
        |SELECT faction_name AS `Faction`,
        |  ROUND(SUM(CASE WHEN transaction_type = 'BUY' THEN gold_total ELSE 0 END), 2)
        |    AS `Total Buy Volume (Gold)`,
        |  ROUND(SUM(CASE WHEN transaction_type = 'SELL' THEN gold_total ELSE 0 END), 2)
        |    AS `Total Sell Volume (Gold)`,
        |  ROUND(SUM(CASE WHEN transaction_type = 'SELL' THEN gold_total ELSE 0 END)
        |      - SUM(CASE WHEN transaction_type = 'BUY' THEN gold_total ELSE 0 END), 2)
        |    AS `Net Profit`,
        |  COUNT(*) AS `Transactions`
        |FROM faction_sales
        |GROUP BY faction_name
        |ORDER BY `Net Profit` DESC""".stripMargin,
    "dm_top_vip_customers" ->
      """SELECT c.customer_name AS `Customer`, f.faction_name AS `Faction`,
        |  COUNT(s.trade_key) AS `Transactions`,
        |  ROUND(SUM(s.gold_total), 2) AS `Total Spent (Gold)`
        |FROM fact_sales s
        |JOIN dim_customer c ON s.customer_key = c.customer_key
        |JOIN dim_faction f ON c.faction_key = f.faction_key
        |WHERE c.customer_segment = 'VIP' AND s.transaction_type = 'BUY'
        |GROUP BY c.customer_name, f.faction_name
        |ORDER BY `Total Spent (Gold)` DESC
        |LIMIT 100""".stripMargin)

  val marts: Map[String, SparkSession => DataFrame] = Map(
    "dm_faction_economy"        -> factionEconomy,
    "dm_resource_price_history" -> resourcePriceHistory,
    "dm_top_vip_customers"      -> topVipCustomers,
    "dm_artifact_trade_summary" -> artifactTradeSummary)

  /** CTAS equivalent: materialize each mart as parquet + temp view
    * (gold_aggregator.py's CREATE OR REPLACE TABLE dm_*). */
  def run(s: SparkSession, goldDir: String): Unit =
    marts.foreach { case (name, f) =>
      val df = f(s)
      df.coalesce(1).write.mode("overwrite").parquet(s"$goldDir/$name")
      s.read.parquet(s"$goldDir/$name").createOrReplaceTempView(name)
    }
}
