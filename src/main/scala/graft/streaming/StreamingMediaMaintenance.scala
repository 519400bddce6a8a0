package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming maintenance of the media perceptual-fingerprint state —
  * the multimodal member of the streaming-maintenance matrix. Per
  * micro-batch of (doc_id, text) arrivals (the fixture's media corpus
  * synthesizes container payloads from documents rows, so arrivals are
  * document rows; a production stream would carry raw payload bytes)
  * the maintainer runs the expensive per-payload work for ONLY the
  * batch — container synthesis, byte walk, codegen'd gram-SimHash
  * ([[graft.llm.MultimodalOps.mediaFps]]) — and appends one `fps/`
  * segment of (doc_id, fp) under `delta/b<id>/`. Purely additive, like
  * the posting family: the segment depends on nothing but the batch,
  * so replay of an unacknowledged batch is idempotent by construction
  * (batch-id-keyed overwrite), with no earlier-segment read to get
  * wrong. Payload bytes never enter a segment — two longs per asset.
  *
  * [[pairsProbe]] is the query path: staged base fingerprints
  * ([[graft.llm.MediaFpIndex]]) ∪ delta segments, then the SAME
  * collapse-then-band pair tail as q182/q186
  * ([[graft.llm.MultimodalOps.fpPairs]]: distinct → 3-of-6
  * combinatorial band keys → bucket join → exact Hamming ≤ 3 verify →
  * member expansion) — so the integrity contract carries over
  * verbatim: the streamed state must pair EXACTLY like a fresh
  * full-corpus run, which StreamingMediaMaintenanceSpec pins against
  * oracle-checked q182 over three file arrivals.
  *
  * 100 TB posture: per batch the work is one O(batch) narrow hash pass
  * (no shuffle at all — the segment write is the only materialization);
  * probe-time banding explodes DISTINCT fingerprints only, and
  * [[DeltaDirs.compact]] bounds the probe's segment-listing cost by
  * the compaction cadence, not the stream's age. */
object StreamingMediaMaintenance {

  private val fpsSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("fp", LongType)))

  /** The accumulated delta fingerprints across all landed batches
    * (additive segments need no strictly-before filtering at probe
    * time). */
  def deltaFps(s: SparkSession, deltaDir: String): DataFrame =
    MaintainerHarness.delta(s, deltaDir, "fps", fpsSchema)

  /** The foreachBatch function: fingerprint the batch's payloads,
    * append its (doc_id, fp) segment. Every frame derives from `batch`
    * alone; the rest is the shared [[MaintainerHarness]] skeleton. */
  def mediaMaintain(deltaDir: String, foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(Seq("fps" -> fpsSchema), deltaDir,
      foldSegments) { (_, b) =>
      Map("fps" -> graft.llm.MultimodalOps.mediaFps(b))
    }(batch, batchId)

  /** Near-dup pairs over staged base ∪ streamed delta fingerprints —
    * q186's probe with the delta unioned in. Must pair exactly like a
    * fresh full-corpus run (the q182 contract).
    *
    * The union dedups on (doc_id, fp) first: a RE-DELIVERED doc — not
    * a replay of the same batchId, but the same doc arriving again in
    * a later batch, the steady state of a recrawl stream — lands its
    * (doc_id, fp) row in two segments, and duplicate keyed rows would
    * multiply member-expansion join output and break the exactly-like-
    * full-corpus contract (ADVICE r12). Keys only — two longs — so the
    * dedup shuffle is narrow, and fpPairs' banding already collapses
    * to distinct fps internally, so this adds one exchange over keys,
    * nothing payload-sized. */
  def pairsProbe(s: SparkSession, baseFps: DataFrame,
      deltaDir: String): DataFrame =
    graft.llm.MultimodalOps.fpPairsAuto(graft.Materialize.stable(
      baseFps.unionByName(deltaFps(s, deltaDir))
        .dropDuplicates("doc_id", "fp")))
}
