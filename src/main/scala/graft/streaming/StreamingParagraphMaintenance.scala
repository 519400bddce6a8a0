package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming maintenance of the paragraph-digest set — the EIGHTH
  * member of the streaming-maintenance matrix (exact-dup digests,
  * LSH bands, BM25 postings, IVF lists, semdedup components, teacher
  * counts, media fingerprints — and now sub-document paragraph
  * digests, so the CCNet-shaped cleanup of q187/q189/q190 keeps up
  * with continuous ingest instead of waiting for corpus-version
  * rebuilds). State is the set of paragraph digests seen so far: per
  * micro-batch of (doc_id, text) arrivals, split + digest ONLY the
  * batch ([[graft.llm.TextOps.paraDigests]]) and append one `dgs/`
  * segment under `delta/b<id>/` — purely additive, like the posting
  * and classifier families, so replay of an unacknowledged batch is
  * idempotent by construction (batch-id-keyed overwrite) with no
  * earlier-segment read to get wrong.
  *
  * Arrival contract — STRICTLY WEAKER than its siblings': the algebra
  * is set PRESENCE, not a SUM, so a re-delivered document (a recrawl
  * landing the same text under a new batchId — the exact case the
  * classifier family must exclude, ADVICE r12) lands duplicate digest
  * rows that change nothing at probe time. No upstream dedup filter
  * is required; this maintainer IS the upstream filter for the
  * paragraph granularity.
  *
  * [[cleanedProbe]] is the recrawl-cleaning path: probe docs are
  * deduped against base ∪ delta digests through the same shared tail
  * as oracle-backed q189/q190
  * ([[graft.llm.TextOps.paragraphDedupAgainst]]), so the integrity
  * contract carries over verbatim: the streamed digest set must clean
  * a batch EXACTLY like the split-everything plan
  * (StreamingParagraphMaintenanceSpec pins it).
  *
  * 100 TB posture: per batch the work is one O(batch) split+digest
  * with a map-side-combined distinct into 32-hex-char rows — nothing
  * corpus-scale moves, paragraph text never enters a segment; the
  * probe joins the batch's ≤|batch paras| digests against the staged
  * column ([[graft.llm.ParaDigestIndex]]) plus delta segments whose
  * listing cost [[DeltaDirs.compact]]'s tiered folds bound. */
object StreamingParagraphMaintenance {

  private val dgSchema = StructType(Seq(StructField("dg", StringType)))

  /** The accumulated delta digests across all landed batches (additive
    * segments need no strictly-before filtering at probe time, and the
    * presence algebra needs no distinct across segments). */
  def deltaDgs(s: SparkSession, deltaDir: String): DataFrame =
    MaintainerHarness.delta(s, deltaDir, "dgs", dgSchema)

  /** The foreachBatch function: split + digest the batch, append its
    * digest segment. Every frame derives from `batch` alone; the rest
    * is the shared [[MaintainerHarness]] skeleton. */
  def paragraphMaintain(deltaDir: String, foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(Seq("dgs" -> dgSchema), deltaDir,
      foldSegments) { (_, b) =>
      Map("dgs" -> graft.llm.TextOps.paraDigests(b))
    }(batch, batchId)

  /** Clean `probeDocs` against base ∪ delta digests — q189/q190's
    * output shape through their exact shared tail, byte-for-byte
    * q189's result when base+delta cover the corpus side. */
  def cleanedProbe(s: SparkSession, probeDocs: DataFrame,
      baseDgs: DataFrame, deltaDir: String): DataFrame =
    graft.llm.TextOps.paragraphDedupAgainst(probeDocs,
      baseDgs.unionByName(deltaDgs(s, deltaDir)))
}
