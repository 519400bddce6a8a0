package graft.erathia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Report viewer (reference: /root/reference/main.py:247-347) — catalog
  * listing, full-mart reads, and the parameterized drill-down. */
object Viewer {

  /** Catalog listing of gold marts (main.py:263: LIKE 'dm_%'). */
  def listMarts(s: SparkSession): Seq[String] =
    s.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith("dm_")).sorted.toSeq

  /** Full report (main.py:337: SELECT * FROM mart). */
  def report(s: SparkSession, mart: String): DataFrame = s.table(mart)

  /** Drill-down value list (main.py:304: DISTINCT resource names). */
  def resourceNames(s: SparkSession): DataFrame =
    s.table("dm_resource_price_history")
      .select(col("Resource Name")).distinct().orderBy("Resource Name")

  /** Parameterized drill-down (main.py:326-327): one resource's price
    * history, chronological. */
  def priceDrilldown(s: SparkSession, resource: String): DataFrame =
    s.table("dm_resource_price_history")
      .filter(col("Resource Name") === resource)
      .orderBy("Year", "Month")
}
