package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming maintenance of the exact-dedup digest index — the missing
  * half of continuous ingest. The stream-static probe (q87's streaming
  * form, StreamingIngestDedupSpec) flags arrivals against a FROZEN
  * staged digest table; here the index also GROWS with the stream, so a
  * document that arrived in micro-batch 3 dedups anything re-arriving
  * in micro-batch 7.
  *
  * Shape: a `foreachBatch` sink. Per micro-batch:
  *   1. flag the batch against staged base digests ∪ the delta written
  *     by earlier batches (within-batch clones flag against the batch's
  *     own min-id copy, one groupBy on the 16-byte digest);
  *   2. write the flags to `out/b<id>/`;
  *   3. append the batch's FIRST-SEEN digests (not in base/delta/earlier
  *     in this batch) to `delta/b<id>/`.
  *
  * Restart safety: both writes are keyed by the micro-batch id and use
  * overwrite, so Structured Streaming's replay of an unacknowledged
  * batch is idempotent — the foreachBatch exactly-once recipe. Every
  * step is a narrow digest join (16-byte keys, no text on any
  * exchange); per batch the work is O(batch) against a broadcastable
  * digest sliver, never a corpus re-scan — the property that makes this
  * viable as a continuously-running job at 100 TB, with the base index
  * rebuilt offline on its own cadence (the BandIndex contract) and the
  * delta compacted into it at each rebuild.
  *
  * StreamingIndexMaintenanceSpec pins the contract: after N arrivals,
  * (flags, grown index) equal a driver-side replay of the same arrival
  * order, and re-arrivals of earlier-batch docs are flagged with the
  * ORIGINAL representative id. */
object StreamingIndexMaintenance {

  /** Read the delta digest table (union of per-batch appends);
    * empty-frame-safe before the first batch lands. */
  def deltaDigests(s: SparkSession, deltaDir: String): DataFrame =
    deltaDigestsBefore(s, deltaDir, Long.MaxValue)

  private val digestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("digest",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("rep_id",
      org.apache.spark.sql.types.LongType)))

  /** Delta digests from batches with id STRICTLY BELOW `batchId` — the
    * known side a replaying batch must see. A `b*` glob would also pick
    * up `b<batchId>` left by a failed attempt of the SAME batch: the
    * batch's own digests would then look "known", firstSeen would come
    * out empty (overwriting the delta with nothing — first-seen digests
    * permanently lost), and every first-seen doc would flag as a dup of
    * itself. The shared [[DeltaDirs]] read also pins the EXPLICIT
    * schema: a batch with nothing first-seen writes a zero-part-file
    * segment that schema inference cannot read (the original inference
    * read here crashed every batch after such a write). */
  def deltaDigestsBefore(s: SparkSession, deltaDir: String,
      batchId: Long): DataFrame =
    DeltaDirs.readSegs(s, deltaDir, "", digestSchema, batchId)

  /** The foreachBatch function. `baseDigests` is the staged corpus-side
    * digest table (narrow: digest, rep_id); `deltaDir`/`outDir` are the
    * growing index side and the flag sink. When `foldSegments` live segments accumulate
    * the accumulated delta segments fold into one compacted dir
    * ([[DeltaDirs.compact]]) so the per-batch listing cost is bounded
    * by the cadence, not the stream's age (0 disables). */
  def dedupMaintain(baseDigests: DataFrame, deltaDir: String, outDir: String,
      foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(Seq("" -> digestSchema), deltaDir,
      foldSegments) { (ctx, b) =>
      // A NULL text is not a document body (the mediaTable rule): its
      // md5 digest is NULL, which null-rejects out of the inner
      // batchRep join — the row would silently VANISH from the flags
      // output while its digest=NULL group polluted the delta with a
      // row that can never match anything. Excluded here, loudly
      // documented: null bodies belong to the quarantine ingest path,
      // not the dedup index.
      val probe = ctx.pin(b.filter(col("text").isNotNull)
        .select(col("doc_id"), md5(col("text")).as("digest")))
      // Known side: base ∪ delta from STRICTLY EARLIER batches — never
      // this batch's own dir, which a failed prior attempt of the same
      // batch may have left behind (the harness's strictly-before
      // read). Narrow (16-byte digest + id); at most one row per
      // distinct text seen. NOT pinned: the base side is corpus-scale
      // columnar parquet — checkpointing it per batch would cost more
      // than the rescan (the band family's rule).
      val known = baseDigests.select(col("digest"), col("rep_id"))
        .unionByName(ctx.earlier(""))
      // Within-batch clones: the min doc_id per digest is the batch's
      // own candidate representative.
      val batchRep = probe.groupBy("digest")
        .agg(min(col("doc_id")).as("batch_rep"))
      probe
        .join(known, Seq("digest"), "left")
        .join(batchRep, Seq("digest"))
        .select(col("doc_id"), col("digest"),
          // dup iff known before, or a smaller id in this very batch
          coalesce(col("rep_id"),
            when(col("batch_rep") < col("doc_id"), col("batch_rep"))
              .otherwise(lit(-1L))).as("rep_id"))
        .select(col("doc_id"),
          col("rep_id"),
          (col("rep_id") =!= -1L).as("is_exact_dup"))
        .write.mode("overwrite").parquet(s"$outDir/b${ctx.batchId}")
      // First-seen digests join the index: not known, and this row is
      // the batch representative for its digest.
      Map("" -> probe
        .join(known.select(col("digest")), Seq("digest"), "left_anti")
        .groupBy("digest").agg(min(col("doc_id")).as("rep_id")))
    }(batch, batchId)
}
