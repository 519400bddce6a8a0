package graft.tools

import org.apache.spark.sql.SparkSession

/** One-query bench harness for plan iteration: times named catalog
  * queries through the same noop-sink materialization as `graft.Bench`,
  * without paying for the other ~100 queries. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.tools.TimeQuery q93_edit_neardup [reps]"
  *
  * Prints one line per rep (first rep absorbs codegen/JIT warmup —
  * compare the later reps when judging a plan change).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val names = args.filterNot(_.forall(_.isDigit)).toSeq
    val reps = args.find(_.forall(_.isDigit)).map(_.toInt).getOrElse(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_RELEASE=1 mirrors Bench's per-repeat
    // Materialize.releaseTransient call, so a TimeQuery-vs-Bench timing
    // gap can be attributed to the release (or ruled out) directly.
    val release = sys.env.get("SPARK_GRAFT_RELEASE").contains("1")
    // SPARK_GRAFT_WARM_INDEXES=1 mirrors Bench's warmup (offline index
    // staging) for the same bisection purpose.
    // SPARK_GRAFT_CALIB=1 mirrors Bench's calibration probes (idem).
    if (sys.env.get("SPARK_GRAFT_CALIB").contains("1")) {
      for (_ <- 1 to 3) {
        spark.range(200000000L)
          .selectExpr("sum(pmod(xxhash64(id), 1000000))").collect()
        spark.range(20000000L).selectExpr("id % 100000 as k", "id as v")
          .groupBy("k").agg(org.apache.spark.sql.functions.sum("v"))
          .selectExpr("sum(hash(k, `sum(v)`))").collect()
      }
      if (sys.env.get("SPARK_GRAFT_CALIB_GC").contains("1")) {
        System.gc(); Thread.sleep(2000)
      }
    }
    if (sys.env.get("SPARK_GRAFT_WARM_INDEXES").contains("1")) try {
      graft.llm.IvfIndex.ensure(spark, sfDir)
      graft.llm.BandIndex.ensure(spark, sfDir,
        graft.llm.BandIndex.Boundary.ingestMod10)
      graft.llm.BandIndex.ensure(spark, sfDir,
        graft.llm.BandIndex.Boundary.all)
      graft.llm.PostingIndex.ensure(spark, sfDir)
      graft.llm.SemDedupIndex.ensure(spark, sfDir)
      graft.llm.MediaFpIndex.ensure(spark, sfDir)
      graft.llm.ParaDigestIndex.ensure(spark, sfDir)
      graft.llm.OverlapSketchIndex.ensure(spark, sfDir)
      graft.llm.SpanDigestIndex.ensure(spark, sfDir)
      graft.ops.GraphIndex.ensure(spark, sfDir)
    } catch { case _: Throwable => () }
    for (n <- names; r <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[timequery] $n rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s")
      if (release) graft.Materialize.releaseTransient(spark)
    }
    spark.stop()
  }
}
