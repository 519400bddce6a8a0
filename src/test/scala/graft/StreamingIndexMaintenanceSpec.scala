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

  test("replay of an unacknowledged batch is idempotent (kill-and-restart)") {
    // Structured Streaming re-runs foreachBatch with the SAME batch id
    // if the sink commit was not acknowledged. The first (failed)
    // attempt has already written delta/b<id>; the replay must not see
    // that dir as "known", or every first-seen doc flags as a dup of
    // itself and the delta is overwritten with an empty frame.
    val root = java.nio.file.Files.createTempDirectory("simx-replay").toString
    val delta = s"$root/delta"; val out = s"$root/out"
    val base = Seq((100L, "base doc text"))
      .toDF("rep_id", "text")
      .select(md5(col("text")).as("digest"), col("rep_id"))
    val fn = StreamingIndexMaintenance.dedupMaintain(base, delta, out) _
    fn(Seq(1L -> "alpha", 2L -> "alpha").toDF("doc_id", "text"), 0L)
    val b1 = Seq(11L -> "alpha", 12L -> "beta").toDF("doc_id", "text")
    def snap(dir: String) = spark.read.parquet(dir).collect()
      .map(_.toSeq).sortBy(_.mkString("|")).toSeq
    fn(b1, 1L) // first attempt: commit "lost"
    val flagsA = snap(s"$out/b1"); val deltaA = snap(s"$delta/b1")
    fn(b1, 1L) // replay after restart
    assert(snap(s"$out/b1") == flagsA, "replayed flags drifted")
    assert(snap(s"$delta/b1") == deltaA, "replayed delta drifted")
    // semantic pin: 12 is FIRST-SEEN, not a dup of itself
    val flags = spark.read.parquet(s"$out/b1").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(flags == Map(11L -> ((1L, true)), 12L -> ((-1L, false))), s"got $flags")
    val d1 = spark.read.parquet(s"$delta/b1").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val betaDigest = java.security.MessageDigest.getInstance("MD5")
      .digest("beta".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(d1 == Map(betaDigest -> 12L), s"delta/b1: $d1")
    // and the NEXT batch still dedups against the replayed batch's docs
    fn(Seq(21L -> "beta").toDF("doc_id", "text"), 2L)
    val f2 = spark.read.parquet(s"$out/b2").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(f2 == Map(21L -> ((12L, true))), s"got $f2")
  }

  test("a batch with nothing first-seen does not poison later batches") {
    // An all-re-arrivals batch writes an EMPTY delta segment (zero
    // parquet part files). The delta read must carry an explicit
    // schema: inference over such a segment throws and would kill the
    // stream on EVERY subsequent batch (and its replays) — the crash
    // class the shared DeltaDirs read exists to prevent.
    val root = java.nio.file.Files.createTempDirectory("simx-empty").toString
    val delta = s"$root/delta"; val out = s"$root/out"
    val base = Seq((100L, "known text"))
      .toDF("rep_id", "text")
      .select(md5(col("text")).as("digest"), col("rep_id"))
    val fn = StreamingIndexMaintenance.dedupMaintain(base, delta, out) _
    fn(Seq(10L -> "known text").toDF("doc_id", "text"), 0L) // re-arrival only
    // b0's delta segment exists but holds no rows — now batch 1 reads it
    fn(Seq(11L -> "fresh text").toDF("doc_id", "text"), 1L)
    val f1 = spark.read.parquet(s"$out/b1").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(f1 == Map(11L -> false), s"got $f1")
  }

  test("null-text rows are excluded from the dedup index, not silently dropped mid-join") {
    // md5(NULL) = NULL null-rejects out of the inner batchRep join, so
    // an unfiltered null-text row would VANISH from the flags while
    // appending an unmatchable digest=NULL row to the delta. The
    // maintainer excludes null bodies at the boundary (they belong to
    // the quarantine path); non-null rows in the same batch behave
    // exactly as before.
    val root = java.nio.file.Files.createTempDirectory("simx-null").toString
    val delta = s"$root/delta"; val out = s"$root/out"
    val base = Seq((100L, "known text"))
      .toDF("rep_id", "text")
      .select(md5(col("text")).as("digest"), col("rep_id"))
    val fn = StreamingIndexMaintenance.dedupMaintain(base, delta, out) _
    fn(Seq((20L, "known text"), (21L, null), (22L, "fresh"))
      .toDF("doc_id", "text"), 0L)
    val flags = spark.read.parquet(s"$out/b0").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(flags == Map(20L -> true, 22L -> false), s"got $flags")
    val deltaRows = spark.read.parquet(s"$delta/b0").collect()
    assert(deltaRows.forall(r => !r.isNullAt(0)),
      "delta must never carry a NULL digest")
  }
}
