package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session alternating A/B of the paragraph-dedup cleaned-text
  * rebuild at a soak scale (VERDICT r17 item 5): the composed
  * `array_join(transform(array_sort(collect_list(...))))` form
  * (interpreted sort-comparator + field-pluck lambdas per doc) vs the
  * fused [[graft.functions.HashKernels.sorted_para_join]] kernel.
  * Drives the REAL operator (`TextOps.paragraphDedup` over a frame)
  * through its `spark.graft.paraJoinFuse` seam on ScaleSoak's
  * synthetic corpus. Usage:
  *
  *   sbt "runMain graft.tools.ParaFuseAB [reps=100] [pairs=3]"
  */
object ParaFuseAB {
  def main(args: Array[String]): Unit = {
    val reps = args.lift(0).map(_.toInt).getOrElse(100)
    val pairs = args.lift(1).map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions",
        math.max(8, math.min(256, reps)).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "1min")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val src = "/root/testdata/sf0.1"
    val dir = java.nio.file.Files.createTempDirectory("paraab").toString
    val nDocs = spark.read.parquet(s"$src/documents.parquet").count()
    val n = nDocs * reps
    val vocabArr = array((0 until 1000).map(i => lit(s"w$i")): _*)
    spark.range(n).select(col("id").as("doc_id"))
      .select(col("doc_id"),
        concat_ws(" ", transform(
          sequence(lit(1),
            lit(40) + pmod(xxhash64(col("doc_id")), lit(40)).cast("int")),
          i => element_at(vocabArr,
            (pmod(xxhash64(col("doc_id"), i), lit(1000)) + 1).cast("int"))))
          .as("text"))
      .repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[parafuseab] corpus $n docs at $dir")

    def loadavg: String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ").head
      catch { case _: Throwable => "?" }
    def run(name: String, fuse: String): Unit = {
      spark.conf.set("spark.graft.paraJoinFuse", fuse)
      val l0 = loadavg
      val t0 = System.nanoTime()
      graft.llm.TextOps.paragraphDedup(docs)
        .write.format("noop").mode("overwrite").save()
      println(f"[parafuseab] $name ${(System.nanoTime() - t0) / 1e9}%.2f s (loadavg $l0)")
      graft.Materialize.releaseTransient(spark)
    }
    run("warmup composed", "0")
    run("warmup fused   ", "1")
    for (p <- 1 to pairs) {
      run(s"composed pair$p", "0")
      run(s"fused    pair$p", "1")
    }
    spark.stop()
  }
}
