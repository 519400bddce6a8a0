package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints formatted physical plans for representative
  * queries so scan pruning, pushdown, join strategy, and codegen spans
  * can be reviewed. Usage: runMain graft.tools.ExplainAudit [names...] */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q01_faction_economy", "q02_price_history", "q03_top_customers",
        "q05_clean_filter", "q30_text_stats", "q40_cosine_topk", "q43_minhash_neardup")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
