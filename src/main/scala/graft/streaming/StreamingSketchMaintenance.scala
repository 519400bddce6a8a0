package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Streaming maintenance of the corpus-overlap MinHash sketch — the
  * NINTH member of the streaming-maintenance matrix, and the cheapest:
  * state is |sources| × K=16 min cells. Per micro-batch of
  * (source, text) arrivals the maintainer shingles ONLY the batch and
  * appends its per-source sketch ([[graft.llm.CorpusAudit.sourceSketch]])
  * as one `sketch/` segment under `delta/b<id>/` — purely additive,
  * like the posting/paragraph families, so replay of an unacknowledged
  * batch is idempotent by construction (batch-id-keyed overwrite) with
  * no earlier-segment read to get wrong.
  *
  * Arrival contract — the PARAGRAPH-grade (weakest) one: the algebra
  * is MIN, idempotent under duplication, so a re-delivered document (a
  * recrawl landing the same text again under a new batchId — the case
  * the classifier family must anti-join away) lands duplicate min
  * candidates that change nothing at probe time. No upstream dedup is
  * required, and unlike every other family the PROBE-side merge cost
  * is constant: segments fold by one |sources|-row min-merge
  * ([[graft.llm.CorpusAudit.mergeSketches]]), so even an uncompacted
  * thousand-segment delta reads in milliseconds. Compaction here
  * bounds only the file-listing cost, not the merge.
  *
  * [[overlapProbe]] is the report path: staged base sketch
  * ([[graft.llm.OverlapSketchIndex]]) ∪ delta segments → min-merge →
  * the same all-pairs estimate tail as oracle-backed q192
  * ([[graft.llm.CorpusAudit.sketchPairsEst]]) — so the integrity
  * contract carries over verbatim: the streamed sketch must estimate
  * EXACTLY like the whole-corpus sketch (min-of-mins is lossless),
  * which StreamingSketchMaintenanceSpec pins against q192's oracle-
  * anchored result over three file arrivals.
  *
  * 100 TB posture: per batch the work is one O(batch) shingle pass
  * with map-side combine into |sources| rows — nothing corpus-scale
  * moves, no distinct shuffle (min is duplicate-insensitive), text
  * never enters a segment; a corpus-version rebuild republishes the
  * base sketch on its own cadence and the delta folds in by MIN. */
object StreamingSketchMaintenance {

  private val sketchSchema = StructType(
    StructField("source", StringType) +:
      (0 until graft.llm.CorpusAudit.SketchK)
        .map(i => StructField(s"m$i", StringType)))

  /** The accumulated delta sketch rows across all landed batches
    * (additive segments need no strictly-before filtering at probe
    * time, and the min algebra needs no dedup across segments). */
  def deltaSketches(s: SparkSession, deltaDir: String): DataFrame =
    MaintainerHarness.delta(s, deltaDir, "sketch", sketchSchema)

  /** The foreachBatch function: shingle + min-sketch the batch, append
    * its sketch segment. Every frame derives from `batch` alone; the
    * rest is the shared [[MaintainerHarness]] skeleton. */
  def sketchMaintain(deltaDir: String, foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(Seq("sketch" -> sketchSchema), deltaDir,
      foldSegments) { (_, b) =>
      Map("sketch" -> graft.llm.CorpusAudit.sourceSketch(b))
    }(batch, batchId)

  /** The all-pairs overlap estimate over staged base ∪ streamed delta
    * sketches — q192's output shape through its exact shared tail,
    * byte-for-byte q192's result when base+delta cover the corpus. */
  def overlapProbe(s: SparkSession, baseSketch: DataFrame,
      deltaDir: String): DataFrame =
    graft.llm.CorpusAudit.sketchPairsEst(
      graft.llm.CorpusAudit.mergeSketches(
        baseSketch.unionByName(deltaSketches(s, deltaDir))))
}
