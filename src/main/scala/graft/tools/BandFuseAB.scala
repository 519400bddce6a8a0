package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-session alternating A/B of the LSH band-digest forms at a soak
  * scale (VERDICT r17 item 4's done-criterion): the pre-r18 composed
  * form (interpreted `transform` rendering 16 band STRINGS per doc,
  * then xxhash64 of each string) vs the fused
  * [[graft.llm.NearDupOps.bandHashes]] (static CreateArray of xxhash64
  * straight over the signature longs). Corpus is ScaleSoak's synthetic
  * recipe (dup-sparse, hash-generated over a 1000-word vocabulary);
  * both arms run signature kernel + band explode + noop sink, so the
  * measured delta is exactly the band-rendering stage. Usage:
  *
  *   sbt "runMain graft.tools.BandFuseAB [reps=100] [pairs=3]"
  */
object BandFuseAB {
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
    val dir = java.nio.file.Files.createTempDirectory("bandab").toString
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
    println(s"[bandfuseab] corpus $n docs at $dir")

    val k = 64
    val bands = 16
    val rows = k / bands
    def sigs = docs.select(col("doc_id"),
      graft.functions.HashKernels.shingle_minhash(col("text"), 3, k).as("sig"))
      .filter(col("sig").isNotNull)
    // pre-r18 composed form (bandKeys string render + xxhash64 of it)
    def composed = sigs.select(col("doc_id"),
      explode(transform(
        transform(sequence(lit(0), lit(bands - 1)), b =>
          concat_ws("_", b.cast("string"),
            concat_ws(",",
              slice(col("sig"), b * rows + 1, lit(rows)).cast("array<string>")))),
        s => xxhash64(s))).as("band"))
    def fused = sigs.select(col("doc_id"),
      explode(graft.llm.NearDupOps.bandHashes(col("sig"), k, bands)).as("band"))

    def loadavg: String =
      try java.nio.file.Files.readString(
        java.nio.file.Paths.get("/proc/loadavg")).split(" ").head
      catch { case _: Throwable => "?" }
    def run(name: String, f: => org.apache.spark.sql.DataFrame): Unit = {
      val l0 = loadavg
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[bandfuseab] $name ${(System.nanoTime() - t0) / 1e9}%.2f s (loadavg $l0)")
    }
    // one discarded warmup per arm
    run("warmup composed", composed)
    run("warmup fused   ", fused)
    for (p <- 1 to pairs) {
      run(s"composed pair$p", composed)
      run(s"fused    pair$p", fused)
    }
    spark.stop()
  }
}
