package graft.erathia

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Nested-JSON definitions ingest (reference:
  * /root/reference/src/bronze_generator.py:29-35,63-140 — a Python loop
  * flattening game_definitions.json). Spark-native: one multiLine JSON
  * scan + `explode` per nesting level, entirely parallel.
  *
  * `writeSample` emits a structurally-equivalent definitions document
  * (factions with nested unit arrays, product categories with nested
  * products) so the ingest path is testable without the reference's
  * data files.
  */
object Definitions {

  def writeSample(path: String): Unit = {
    val factions = (1 to 9).map { f =>
      val units = (1 to 4).map { u =>
        s"""{"name": "Unit ${f}_$u", "tier": $u, "income": ${40 + 10 * u}}"""
      }.mkString(",")
      s"""{"name": "Faction $f", "units": [$units]}"""
    }.mkString(",")
    val categories = Seq(
      """{"name": "Resources", "tiers": ["Base", "Low", "Mid"]}""",
      """{"name": "Artifacts", "tiers": ["Treasure", "Minor", "Major", "Relic"]}"""
    ).mkString(",")
    val doc = s"""{\n  "factions": [$factions],\n  "categories": [$categories]\n}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get(path), doc)
  }

  private def readDoc(s: SparkSession, path: String): DataFrame =
    s.read.option("multiLine", true).json(path)

  /** factions array → one row per faction, keys from 100 (the
    * reference's namespace). */
  def factions(s: SparkSession, path: String): DataFrame =
    readDoc(s, path)
      .select(posexplode(col("factions")).as(Seq("idx", "f")))
      .select((col("idx") + 100).cast("long").as("faction_key"),
        col("f.name").as("faction_name"))

  /** two explode levels: factions → units, keys from 5000. */
  def units(s: SparkSession, path: String): DataFrame =
    readDoc(s, path)
      .select(posexplode(col("factions")).as(Seq("fidx", "f")))
      .select(col("fidx"), posexplode(col("f.units")).as(Seq("uidx", "u")))
      .select(
        (col("fidx") * 100 + col("uidx") + 5000).cast("long").as("customer_key"),
        col("u.name").as("customer_name"),
        col("u.tier").cast("int").as("unit_tier"),
        col("u.income").cast("double").as("base_income"),
        (col("fidx") + 100).cast("long").as("faction_key"))

  /** categories × tiers → one row per (category, tier), keys from 200 in
    * DOCUMENT order (Resources' tiers before Artifacts', matching
    * DataGen.dimProductCategory and bronze_generator.py:114-123 —
    * alphabetical ordering would invert the namespace and silently
    * mis-attribute categories on key joins). */
  def categories(s: SparkSession, path: String): DataFrame =
    readDoc(s, path)
      .select(posexplode(col("categories")).as(Seq("cidx", "c")))
      .select(col("cidx"), col("c.name").as("category_name"),
        posexplode(col("c.tiers")).as(Seq("tidx", "tier_level")))
      .withColumn("category_key",
        row_number().over(
          org.apache.spark.sql.expressions.Window
            .orderBy(col("cidx"), col("tidx"))) + 199L)
      .select("category_key", "category_name", "tier_level")
}
