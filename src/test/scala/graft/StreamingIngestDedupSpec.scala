package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{BandIndex, NearDupOps}

/** Streaming ingest dedup (q87's streaming form): the incoming batch
  * arrives as a file stream, and the SAME md5-projection + left join
  * that the batch twin runs becomes a stateless stream-static join
  * against the staged digest directory. Stream ≡ batch is the
  * Structured Streaming contract this spec pins — no watermark, no
  * state store, so the equivalence is exact row-set equality.
  *
  * The shipped fixtures have no exact dup across the mod-10 boundary
  * (their dups are NEAR-dups), so the dup-hit path is exercised on a
  * synthetic corpus with planted cross-boundary clones. */
class StreamingIngestDedupSpec extends AnyFunSuite {
  import TestSpark._

  import spark.implicits._

  private def writeDocs(dir: String, rows: Seq[(Long, String)]): Unit =
    rows.map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  test("stream-static ingest dedup equals the batch twin, dup hits included") {
    val dir = java.nio.file.Files.createTempDirectory("ingestfx").toString
    val corpusText = "the quick brown fox jumps over the lazy dog again and again"
    val otherText = "completely different corpus document body with its own words"
    writeDocs(dir, Seq(
      10L -> corpusText, 11L -> otherText, 20L -> corpusText, // 20 dups 10
      17L -> corpusText,                                      // batch clone of 10
      27L -> "a novel incoming document nothing in the corpus has seen",
      37L -> otherText))                                      // batch clone of 11
    val boundary = BandIndex.Boundary.ingestMod10
    val want = NearDupOps.ingestDedupFlags(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(want == Set((17L, 10L, true), (27L, -1L, false), (37L, 11L, true)),
      s"batch twin wrong: $want")
    // Streaming form: land the batch as files, stream them through the
    // same core against the staged digest directory.
    val batchDir = java.nio.file.Files.createTempDirectory("ingestbatch").toString
    Tables.t(spark, dir, "documents")
      .filter(pmod(col("doc_id"), lit(10)) === 7)
      .select("doc_id", "text")
      .write.mode("overwrite").parquet(batchDir)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val streamed = NearDupOps.flagAgainstDigests(
      spark.readStream.schema(schema).parquet(batchDir)
        .select(col("doc_id"), md5(col("text")).as("digest")),
      BandIndex.digestTable(spark, dir, boundary))
    val got = streaming.StreamOps
      .runToMemory(spark, streamed, "ingest_dedup_stream", OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == want, s"stream/batch drift: missing=${want -- got} extra=${got -- want}")
  }

  test("q87 on the shipped fixture: every batch doc novel (no exact cross dups)") {
    val rows = NearDupOps.ingestDedupFlags(spark, "/root/testdata/sf0.001").collect()
    assert(rows.length == 50)
    assert(rows.forall(r => r.getLong(1) == -1L && !r.getBoolean(2)),
      "fixture unexpectedly grew a cross-boundary exact dup — q87's oracle " +
        "row now covers the hit path too (fine), update this pin")
  }
}
