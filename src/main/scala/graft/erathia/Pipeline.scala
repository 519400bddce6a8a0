package graft.erathia

import org.apache.spark.sql.SparkSession

/** End-to-end medallion pipeline orchestrator — the Spark-native
  * equivalent of the reference CLI's run-all path
  * (/root/reference/main.py:174-211): bronze generation → silver
  * cleaning → gold marts → report preview.
  *
  * Usage: runMain graft.erathia.Pipeline <outDir> [weeks]
  */
object Pipeline {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/erathia")
    val weeks = args.lift(1).map(_.toInt).getOrElse(104)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("erathia-pipeline")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    DataGen.writeBronze(spark, s"$outDir/bronze", weeks)
    val factRows = Silver.run(spark, s"$outDir/bronze", s"$outDir/silver")
    Gold.run(spark, s"$outDir/gold")

    val marts = Viewer.listMarts(spark)
    println(f"[pipeline] $weeks weeks → $factRows fact rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs; marts: ${marts.mkString(", ")}")
    marts.foreach { m =>
      println(s"== $m")
      Viewer.report(spark, m).show(5, truncate = false)
    }
    spark.stop()
  }
}
