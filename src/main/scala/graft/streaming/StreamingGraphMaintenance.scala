package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming maintenance of the co-purchase edge set — the TENTH member
  * of the streaming-maintenance matrix, closing the graph family the
  * way rounds 11–14 closed media, selection, paragraph, and the overlap
  * sketch. Per micro-batch of (o, p) incidence arrivals the maintainer
  * derives within-order edges ([[graft.ops.GraphOps.edgesOf]] — the
  * offline GraphIndex build's exact edge derivation) and appends one
  * `edges/` segment of distinct (u, v) plus one `inc/` segment of the
  * batch's distinct (o, p) incidence under `delta/b<id>/`.
  *
  * Arrival contract — ENFORCED BY EXACT REPAIR (VERDICT r14 item 1,
  * the classifier-family precedent): every co-purchase edge derives
  * from within one order, so an order SPLIT across two micro-batches
  * would lose its cross-batch pairs if each batch were self-joined
  * alone — silently, since each batch's within-batch edges are
  * individually plausible. The maintainer no longer trusts the feeder:
  * it keeps the per-batch `inc/` incidence (two longs per line — the
  * id-pair posture every maintainer shares), and each batch semi-joins
  * the STRICTLY EARLIER incidence on its own order ids. For an order
  * already partially landed, edges are re-derived over (earlier lines
  * ∪ new lines) of that order — the cross-batch pairs land exactly,
  * and the re-emitted old-old pairs are absorbed by the probe's
  * keyed dedup. In steady state (whole-order feeders) the prior frame
  * is EMPTY and the batch cost is the same within-batch self-join as
  * before, plus one ids-only lookup.
  *
  * RE-DELIVERED whole orders were already harmless by algebra (edge
  * presence, probe dedup) and remain so: their prior lines equal their
  * new lines, so the re-derived edges are byte-identical duplicates.
  * Replay of an unacknowledged batch is idempotent because the prior
  * read is strictly-before ([[DeltaDirs.readSegs]] with this batchId —
  * a replaying batch never sees its own crashed attempt's `inc/`
  * segment) and both writes are batch-id-keyed overwrites of frames
  * that derive only from the batch and that unchangeable prior state.
  *
  * [[degreeProbe]] is the report path: base edge table (the staged
  * per-corpus-version `GraphIndex.edges` shape) ∪ delta segments →
  * (u, v) dedup → the SAME q151 tail as the full-corpus profile
  * ([[graft.ops.GraphOps.degreeProfileOf]]) — so the integrity contract
  * carries over verbatim: the streamed edge set must profile EXACTLY
  * like a from-scratch full-corpus derivation, which
  * StreamingGraphMaintenanceSpec pins against oracle-checked q151/q194
  * over three whole-order arrivals AND over a split-order arrival (one
  * order's lines divided across two batches — the leg that silently
  * lost edges before this repair existed).
  *
  * 100 TB posture: per batch the work is one within-order self-join
  * bounded by the batch's line counts plus one semi-join keyed on
  * order ids against the accumulated `inc/` store (fixed-width id
  * pairs; at warehouse scale bucketed by `o`, the S7 layout, so the
  * lookup co-locates — and its OUTPUT is bounded by the re-seen
  * orders' line counts, i.e. empty in steady state). Segments carry
  * fixed-width id pairs; the probe's dedup shuffle keys on two longs,
  * and [[DeltaDirs.compact]]'s tiered folds bound the segment-listing
  * cost by the cadence, not the stream's age. */
object StreamingGraphMaintenance {

  private val edgesSchema = StructType(Seq(
    StructField("u", LongType),
    StructField("v", LongType)))

  private val incSchema = StructType(Seq(
    StructField("o", LongType),
    StructField("p", LongType)))

  /** The accumulated delta edges across all landed batches (additive
    * segments need no strictly-before filtering at probe time; the
    * probe's keyed dedup absorbs cross-segment repeats). */
  def deltaEdges(s: SparkSession, deltaDir: String): DataFrame =
    MaintainerHarness.delta(s, deltaDir, "edges", edgesSchema)

  /** The foreachBatch function: derive the batch's within-order edges —
    * repaired across batch boundaries for any order already partially
    * landed (scaladoc above) — and append its (u, v) segment plus the
    * batch's (o, p) incidence segment. Segment writes, strictly-before
    * reads, and the compaction cadence are the shared
    * [[MaintainerHarness]] skeleton. */
  def graphMaintain(deltaDir: String, foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(
      Seq("edges" -> edgesSchema, "inc" -> incSchema), deltaDir,
      foldSegments) { (ctx, b) =>
      val bi = ctx.pin(b.select(col("o"), col("p")).distinct())
      // earlier-landed lines of orders present in THIS batch: nonempty
      // only for split or re-delivered orders (ids-only semi-join)
      val prior = ctx.earlier("inc")
        .join(bi.select("o").distinct(), Seq("o"), "left_semi")
      Map(
        "edges" -> graft.ops.GraphOps.edgesOf(bi.unionByName(prior)),
        "inc" -> bi)
    }(batch, batchId)

  /** Degree profile over staged base ∪ streamed delta edges — q151's
    * output shape through its exact shared tail, byte-for-byte the
    * full-corpus profile when base+delta cover the corpus. */
  def degreeProbe(s: SparkSession, baseEdges: DataFrame,
      deltaDir: String): DataFrame =
    graft.ops.GraphOps.degreeProfileOf(graft.Materialize.stable(
      baseEdges.unionByName(deltaEdges(s, deltaDir))
        .dropDuplicates("u", "v")))
}
