package graft.erathia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Silver layer: cleaning + enrichment, re-expressing
  * /root/reference/src/silver_processor.py:7-96 Spark-first.
  *
  * The reference's DuckDB hop (silver_processor.py:75-86 — write parquet,
  * reopen in another engine) disappears entirely: silver DataFrames
  * register as temp views and gold reads them in the same session
  * (SURVEY.md §3 entry point 1, step 4).
  *
  * Each transform is a `DataFrame => DataFrame` so pipelines compose with
  * `transform(...)`; all are narrow or single-shuffle and hold at any
  * scale.
  */
object Silver {

  val dims: Seq[String] = Seq("dim_customer", "dim_product", "dim_town",
    "dim_faction", "dim_product_category", "dim_date")

  /** Key column per dim, for dedup (silver_processor.py:53-64 key_mapping). */
  val keyOf: Map[String, String] = Map(
    "dim_customer" -> "customer_key", "dim_product" -> "product_key",
    "dim_town" -> "town_key", "dim_faction" -> "faction_key",
    "dim_product_category" -> "category_key", "dim_date" -> "date_key")

  /** Fact cleaning (silver_processor.py:38-43): drop rows null in any
    * critical key, drop zero quantities. Both predicates push to the scan. */
  def cleanFact(df: DataFrame): DataFrame =
    df.na.drop(Seq("trade_key", "customer_key", "product_key", "date_key"))
      .filter(col("quantity") =!= 0)

  /** Deterministic key dedup (vs. dropDuplicates' arbitrary pick —
    * silver_processor.py:47): keep the first row per key under a total
    * order over ALL columns, so the survivor is identical across runs,
    * partitionings, and task retries. (Ordering by the key alone would
    * be vacuous inside its own partition.) */
  def dedupByKey(key: String)(df: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(key))
      .orderBy(df.columns.map(col).toIndexedSeq: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Customer enrichment (silver_processor.py:47-50): is_hero flag. */
  def enrichCustomer(df: DataFrame): DataFrame =
    df.withColumn("is_hero", col("customer_segment") === "VIP")

  /** Run the full silver stage: bronzeDir → silverDir parquet + temp
    * views named like the reference's DuckDB tables. Returns the cleaned
    * fact row count (the verification probe, silver_processor.py:88-93). */
  def run(s: SparkSession, bronzeDir: String, silverDir: String): Long = {
    // Bronze is the ingest boundary: every read is validated against the
    // declared schema (schema.Schemas.erathia) and fails fast on drift.
    val fact = cleanFact(
      graft.schema.Schemas.readErathia(s, s"$bronzeDir/fact_sales", "fact_sales"))
    fact.write.mode("overwrite").partitionBy("year", "month")
      .parquet(s"$silverDir/fact_sales")

    dims.foreach { d =>
      val cleaned = graft.schema.Schemas.readErathia(s, s"$bronzeDir/$d", d)
        .transform(dedupByKey(keyOf(d)))
        .transform(df => if (d == "dim_customer") enrichCustomer(df) else df)
      cleaned.coalesce(1).write.mode("overwrite").parquet(s"$silverDir/$d")
    }

    registerFromDisk(s, silverDir)
    s.table("fact_sales").count()
  }

  /** Register the silver tables of an existing on-disk layer as temp
    * views — lets Gold (and a restarted CLI session) run against a
    * silver layer produced by an earlier session, the way the
    * reference's persistent DuckDB file does. */
  def registerFromDisk(s: SparkSession, silverDir: String): Unit =
    (dims :+ "fact_sales").foreach { t =>
      s.read.parquet(s"$silverDir/$t").createOrReplaceTempView(t)
    }
}
