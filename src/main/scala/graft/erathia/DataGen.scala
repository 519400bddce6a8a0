package graft.erathia

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Spark-native bronze-layer generator: emits the reference's star schema
  * (schemas at /root/reference/src/schemas.py:6-19 and
  * bronze_generator.py:38-140; key namespaces bronze_generator.py:18-25)
  * as parquet, with `fact_sales` hive-partitioned by (year, month) like
  * bronze_generator.py:474-479.
  *
  * The reference's agent-based simulation (bronze_generator.py:144-374) is
  * inherently sequential — global market state mutated week by week. It is
  * deliberately NOT translated (SURVEY.md §7.4): this generator produces
  * the same table shapes, key namespaces, value domains, and statistical
  * structure *distributionally*, so every downstream silver/gold operator
  * sees equivalent data. All randomness is `xxhash64`-derived from row
  * keys — deterministic under any partitioning or cluster size, unlike
  * `rand(seed)` which is seeded per partition. The weekly price evolution
  * (update_market_prices, bronze_generator.py:347-368) is re-expressed as
  * a windowed cumulative product (exp∘sum∘log) per product, clamped to
  * [0.1×, 10×] base like the reference — a distributed recurrence instead
  * of a driver loop.
  */
object DataGen {

  val LoreYearOffset: Int = 1168 - 2000 // config.py:10

  /** Deterministic uniform in [0,1) from key columns + salt. */
  def u01(salt: String, keys: Column*): Column =
    pmod(xxhash64((keys :+ lit(salt)): _*), lit(1000000L)).cast("double") / 1000000.0

  /** Deterministic integer in [0, n) from key columns + salt. */
  def uInt(salt: String, n: Int, keys: Column*): Column =
    pmod(xxhash64((keys :+ lit(salt)): _*), lit(n.toLong)).cast("int")

  // ---- dimensions --------------------------------------------------------

  /** 9 factions, keys from 100 (bronze_generator.py:75-77). */
  def dimFaction(s: SparkSession): DataFrame =
    s.range(9).select(
      (col("id") + 100).as("faction_key"),
      concat(lit("Faction "), (col("id") + 1).cast("string")).as("faction_name"))

  /** 45 towns, 5 per faction, keys from 10000; prefix+" "+suffix names
    * (bronze_generator.py:74-85). */
  def dimTown(s: SparkSession): DataFrame = {
    val prefixes = array(Seq("North", "South", "East", "West", "Old").map(lit): _*)
    val suffixes = array(Seq("Haven", "Gate", "Keep", "Ford", "Spire",
      "Hollow", "Reach", "Watch", "Fall").map(lit): _*)
    s.range(45).select(
      (col("id") + 10000).as("town_key"),
      concat_ws(" ",
        element_at(prefixes, (col("id") % 5 + 1).cast("int")),
        element_at(suffixes, (col("id") / 5 + 1).cast("int"))).as("town_name"),
      (col("id") / 5 + 100).as("faction_key"))
  }

  /** 7 categories, keys from 200: Resources×{Base,Low,Mid} +
    * Artifacts×{Treasure,Minor,Major,Relic} (bronze_generator.py:114-123). */
  def dimProductCategory(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (200L, "Resources", "Base"), (201L, "Resources", "Low"),
      (202L, "Resources", "Mid"),
      (203L, "Artifacts", "Treasure"), (204L, "Artifacts", "Minor"),
      (205L, "Artifacts", "Major"), (206L, "Artifacts", "Relic")
    ).toDF("category_key", "category_name", "tier_level")
  }

  /** 47 products, keys from 1000: 12 resources + 35 artifacts, base value
    * grows with tier (bronze_generator.py:125-138). */
  def dimProduct(s: SparkSession): DataFrame =
    s.range(47).select(
      (col("id") + 1000).as("product_key"),
      when(col("id") < 12, concat(lit("Resource "), (col("id") + 1).cast("string")))
        .otherwise(concat(lit("Artifact "), (col("id") - 11).cast("string")))
        .as("product_name"),
      round(
        when(col("id") < 12, lit(5.0) + col("id") * 7.5)
          .otherwise(lit(500.0) + (col("id") - 12) * 420.0 +
            u01("baseval", col("id")) * 250.0), 2).as("base_value_gold"),
      when(col("id") < 4, 200L).when(col("id") < 8, 201L).when(col("id") < 12, 202L)
        .when(col("id") < 26, 203L).when(col("id") < 40, 204L)
        .when(col("id") < 46, 205L).otherwise(206L).as("category_key"))

  /** 368 customers (≈14 units + ≈14 heroes per faction ≈ 41 per faction
    * across 9), keys from 5000; heroes are 'VIP' with unit_tier 0
    * (bronze_generator.py:93-112). */
  def dimCustomer(s: SparkSession): DataFrame = {
    val perFaction = 41 // 368 ≈ 9 × 41 (last faction one short)
    s.range(368).select(
      (col("id") + 5000).as("customer_key"),
      concat(
        when(col("id") % perFaction < 14, lit("Hero ")).otherwise(lit("Unit ")),
        (col("id") + 1).cast("string")).as("customer_name"),
      when(col("id") % perFaction < 14, "VIP").otherwise("Standard")
        .as("customer_segment"),
      when(col("id") % perFaction < 14, 0)
        .otherwise((uInt("tier", 7, col("id")) + 1)).as("unit_tier"),
      round(
        when(col("id") % perFaction < 14, lit(800.0) + u01("inc", col("id")) * 1200.0)
          .otherwise(lit(60.0) + u01("inc", col("id")) * 340.0), 2).as("base_income"),
      (col("id") % 9 + 100).as("faction_key"))
  }

  /** 731-day calendar 2000-01-01..2001-12-31 with pandas day-of-week
    * numbering, lore-year offset, and the y*10000+m*100+d smart key
    * (bronze_generator.py:38-61, config.py:8-10). */
  def dimDate(s: SparkSession): DataFrame = {
    val d = s.sql(
      "SELECT explode(sequence(to_date('2000-01-01'), to_date('2001-12-31'))) AS d")
    val dow = (dayofweek(col("d")) + lit(5)) % 7 // pandas: 0=Mon..6=Sun
    val loreYear = year(col("d")) + LoreYearOffset
    d.select(
      (year(col("d")) * 10000 + month(col("d")) * 100 + dayofmonth(col("d")))
        .as("date_key"),
      format_string("%d-%02d-%02d", loreYear, month(col("d")), dayofmonth(col("d")))
        .as("lore_date_str"),
      dow.as("day_of_week"),
      month(col("d")).as("month"),
      loreYear.as("year"),
      dow.isin(5, 6).as("is_weekend"))
  }

  // ---- fact --------------------------------------------------------------

  /** Weekly market price per product: base × cumulative drift. The
    * reference's sequential EWMA update becomes a window cumulative sum of
    * log-factors — one shuffle on product_key, scales to any week count. */
  def weeklyPrices(s: SparkSession, weeks: Int): DataFrame = {
    val products = dimProduct(s).select("product_key", "base_value_gold")
    val grid = products.crossJoin(
      s.range(weeks.toLong).select(col("id").cast("int").as("week")))
    val factor = lit(1.0) +
      (u01("drift", col("product_key"), col("week")) - 0.5) * 0.06
    val w = Window.partitionBy(col("product_key")).orderBy(col("week"))
    grid
      .withColumn("cum_drift", exp(sum(log(factor)).over(w)))
      .select(col("product_key"), col("week"),
        round(greatest(col("base_value_gold") * 0.1,
          least(col("base_value_gold") * 10.0,
            col("base_value_gold") * col("cum_drift"))), 2).as("gold_per_unit"))
  }

  /** Transactions: ~105/week (main.py:111-117 heuristic), keys from 1.
    * Buyer tier/segment weighting, BUY/SELL mix, quantity by tier, and
    * artifact-pool scarcity (Relic=1, Major=5, Treasure/Minor=20 globally,
    * bronze_generator.py:233-240) enforced by ranked sampling: BUYs of an
    * artifact beyond its pool cap are re-pointed at a resource. */
  def factSales(s: SparkSession, weeks: Int): DataFrame = {
    val perWeek = 105
    val n = weeks.toLong * perWeek
    val base = s.range(1, n + 1).select(
      col("id").as("trade_key"),
      ((col("id") - 1) / perWeek).cast("int").as("week"))

    val cust = dimCustomer(s)
      .select(col("customer_key"), col("customer_segment"), col("base_income"))
    val dates = dimDate(s).select(col("date_key"), col("year"), col("month"))
      .withColumn("day_idx", row_number().over(
        Window.orderBy("date_key")) - 1)

    // one trading day per week (the reference trades weekly); wraps at the
    // 731-day calendar so any week count maps onto valid date_keys
    val withKeys = base
      .withColumn("day_idx",
        pmod(col("week") * 7 + uInt("dow", 7, col("trade_key")), lit(731)))
      .withColumn("customer_key", uInt("cust", 368, col("trade_key")) + 5000)
      .withColumn("town_key", uInt("town", 45, col("trade_key")) + 10000)
      .withColumn("transaction_type",
        when(u01("tt", col("trade_key")) < 0.7, "BUY").otherwise("SELL"))

    // product choice: VIPs (heroes) reach artifacts, others mostly resources
    val joined = withKeys
      .join(broadcast(cust), Seq("customer_key"))
      .withColumn("product_key",
        when(col("customer_segment") === "VIP",
          when(u01("p1", col("trade_key")) < 0.5,
            uInt("pa", 35, col("trade_key")) + 1012) // artifacts 1012..1046
            .otherwise(uInt("pr", 12, col("trade_key")) + 1000))
          .otherwise(
            when(u01("p2", col("trade_key")) < 0.92,
              uInt("pr", 12, col("trade_key")) + 1000)
              .otherwise(uInt("pa", 35, col("trade_key")) + 1012)))

    // artifact scarcity: rank BUYs per artifact by trade order, demote
    // overflow back to a resource (ranked sampling, SURVEY.md §7.4)
    val cap = when(col("product_key") === 1046, 1L)      // Relic
      .when(col("product_key") >= 1040, 5L)              // Major
      .when(col("product_key") >= 1012, 20L)             // Treasure/Minor
      .otherwise(1000000000L)
    // each pooled unit can change hands at most twice (one BUY + one SELL)
    // The ranking window runs over artifact rows only (~4% of trades):
    // ranking the full fact table would funnel each of the 12 resource
    // products — which can never hit a cap — through a single reducer,
    // making the cap stage the widest, most skewed sort at high week
    // counts. Resources bypass the window untouched and are unioned
    // back; semantics are identical because art_rank was only ever
    // consulted for artifact rows.
    val wArt = Window.partitionBy(col("product_key")).orderBy(col("trade_key"))
    val artifacts = joined.filter(col("product_key") >= 1012)
      .withColumn("art_rank", row_number().over(wArt))
      .withColumn("product_key",
        when(col("art_rank") > cap * 2, uInt("fallback", 12, col("trade_key")) + 1000)
          .otherwise(col("product_key")))
      .drop("art_rank")
    val capped = joined.filter(col("product_key") < 1012).unionByName(artifacts)

    val qty = when(col("product_key") >= 1012, lit(1.0)) // artifacts unit qty
      .otherwise(round(lit(0.1) + u01("qty", col("trade_key")) * 4.9, 1))

    capped
      .join(broadcast(weeklyPrices(s, weeks)), Seq("product_key", "week"))
      .join(broadcast(dates), Seq("day_idx"))
      .withColumn("quantity", qty)
      .withColumn("gold_total", round(col("gold_per_unit") * col("quantity"), 2))
      .withColumn("current_gold_balance",
        round(col("base_income") * (lit(2.0) + u01("bal", col("trade_key")) * 8.0), 2))
      .select(
        col("trade_key"), col("date_key"), col("transaction_type"),
        col("customer_key"), col("product_key"), col("town_key"),
        col("quantity"), col("gold_per_unit"), col("gold_total"),
        col("current_gold_balance"),
        (col("year")).as("year"), col("month"))
  }

  /** Write the full bronze layer: one parquet per dim (coalesced like
    * silver_processor.py:73's small-dim writes) + hive-partitioned fact. */
  def writeBronze(s: SparkSession, outDir: String, weeks: Int): Unit = {
    dimFaction(s).coalesce(1).write.mode("overwrite").parquet(s"$outDir/dim_faction")
    dimTown(s).coalesce(1).write.mode("overwrite").parquet(s"$outDir/dim_town")
    dimProductCategory(s).coalesce(1).write.mode("overwrite")
      .parquet(s"$outDir/dim_product_category")
    dimProduct(s).coalesce(1).write.mode("overwrite").parquet(s"$outDir/dim_product")
    dimCustomer(s).coalesce(1).write.mode("overwrite").parquet(s"$outDir/dim_customer")
    dimDate(s).coalesce(1).write.mode("overwrite").parquet(s"$outDir/dim_date")
    factSales(s, weeks).write.mode("overwrite")
      .partitionBy("year", "month").parquet(s"$outDir/fact_sales")
  }

  /** Chunked fact generation: append one partitioned write per
    * `chunkWeeks` block, like the reference's DEFAULT_CHUNK_SIZE=100
    * incremental writer (bronze_generator.py:456-484, config.py:13-14).
    * Each chunk filters the same deterministic plan by week range, so
    * chunked output is row-identical to the single-shot write. */
  def writeFactChunked(s: SparkSession, outDir: String, weeks: Int,
    chunkWeeks: Int = 100): Unit = {
    val fact = factSales(s, weeks)
    var start = 0
    var first = true
    while (start < weeks) {
      val end = math.min(start + chunkWeeks, weeks)
      val lo = start.toLong * 105 + 1; val hi = end.toLong * 105
      fact.filter(col("trade_key") >= lo && col("trade_key") <= hi)
        .write.mode(if (first) "overwrite" else "append")
        .partitionBy("year", "month").parquet(s"$outDir/fact_sales")
      first = false
      start = end
    }
  }
}
