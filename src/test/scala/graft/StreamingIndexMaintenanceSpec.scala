package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingIndexMaintenance

/** The continuous-ingest contract: the digest index GROWS with the
  * stream, so a doc first seen in micro-batch 1 dedups its re-arrival
  * in micro-batch 3, within-batch clones flag against the batch's own
  * min-id copy, and representatives are stable (always the FIRST-seen
  * id, never a later clone's). */
class StreamingIndexMaintenanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("stream-grown digest index dedups later arrivals against earlier batches") {
    val root = java.nio.file.Files.createTempDirectory("simx").toString
    val in = s"$root/in"; val delta = s"$root/delta"; val out = s"$root/out"
    new java.io.File(in).mkdirs()
    // staged base corpus: one known doc with rep_id 100
    val base = Seq((100L, "base doc text"))
      .toDF("rep_id", "text")
      .select(md5(col("text")).as("digest"), col("rep_id"))
    var arrivals = 0
    def arrive(rows: Seq[(Long, String)]): Unit = {
      arrivals += 1
      val staging = java.nio.file.Files.createTempDirectory(s"simx-a$arrivals")
      rows.toDF("doc_id", "text").coalesce(1)
        .write.mode("overwrite").parquet(staging.toString)
      val part = java.nio.file.Files.list(staging).iterator()
      var p: java.nio.file.Path = null
      while (part.hasNext) { val f = part.next(); if (f.toString.endsWith(".parquet")) p = f }
      java.nio.file.Files.copy(p,
        java.nio.file.Paths.get(in, s"arrival$arrivals.parquet"))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    arrive(Seq(1L -> "alpha", 2L -> "alpha", 3L -> "base doc text"))
    val q = spark.readStream.schema(schema).parquet(in)
      .writeStream
      .foreachBatch(StreamingIndexMaintenance.dedupMaintain(base, delta, out) _)
      .start()
    try {
      q.processAllAvailable()
      // cross-batch: 11 re-arrives batch-1's "alpha"; 12 is new
      arrive(Seq(11L -> "alpha", 12L -> "beta"))
      q.processAllAvailable()
      // 21 re-arrives batch-2's "beta"; 22 the base doc; 23 fresh
      arrive(Seq(21L -> "beta", 22L -> "base doc text", 23L -> "gamma"))
      q.processAllAvailable()
    } finally q.stop()
    val flags = spark.read.parquet(s"$out/b*").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(flags == Map(
      1L -> ((-1L, false)),   // first sight of "alpha"
      2L -> ((1L, true)),     // within-batch clone → batch min id
      3L -> ((100L, true)),   // staged base rep, not a new id
      11L -> ((1L, true)),    // cross-batch: batch-1's rep survives
      12L -> ((-1L, false)),
      21L -> ((12L, true)),   // cross-batch against batch 2
      22L -> ((100L, true)),  // base rep stable across the whole run
      23L -> ((-1L, false))), s"got $flags")
    // the grown index is exactly the first-seen docs (no base, no dups)
    val grown = StreamingIndexMaintenance.deltaDigests(spark, delta).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val expectDigest = Seq("alpha" -> 1L, "beta" -> 12L, "gamma" -> 23L)
      .map { case (t, id) =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(t.getBytes("UTF-8")).map(b => f"$b%02x").mkString -> id
      }.toMap
    assert(grown == expectDigest, s"grown index: $grown")
  }
}
