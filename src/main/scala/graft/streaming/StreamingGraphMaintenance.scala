package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Streaming maintenance of the co-purchase edge set — the TENTH member
  * of the streaming-maintenance matrix, closing the graph family the
  * way rounds 11–14 closed media, selection, paragraph, and the overlap
  * sketch. Per micro-batch of (o, p) incidence arrivals the maintainer
  * self-joins ONLY the batch within order ([[graft.ops.GraphOps.edgesOf]]
  * — the offline GraphIndex build's exact edge derivation) and appends
  * one `edges/` segment of distinct (u, v) under `delta/b<id>/`. Purely
  * additive: the segment depends on nothing but the batch, so replay of
  * an unacknowledged batch is idempotent by construction (batch-id-keyed
  * overwrite), with no earlier-segment read to get wrong.
  *
  * Arrival contract: batches carry WHOLE orders — every co-purchase
  * edge derives from within one order, so an order split across two
  * batches would lose its cross-batch pairs (the same feeder-side
  * completeness the IVF/semdedup families require of vecArrivals,
  * enforced upstream where the order boundary is known). RE-DELIVERED
  * orders, by contrast, are harmless by construction: the edge algebra
  * is SET PRESENCE, and [[degreeProbe]] dedups (u, v) keys across
  * base ∪ segments before counting (the media family's keys-only fix) —
  * two longs per edge, nothing payload-sized.
  *
  * [[degreeProbe]] is the report path: base edge table (the staged
  * per-corpus-version `GraphIndex.edges` shape) ∪ delta segments →
  * (u, v) dedup → the SAME q151 tail as the full-corpus profile
  * ([[graft.ops.GraphOps.degreeProfileOf]]) — so the integrity contract
  * carries over verbatim: the streamed edge set must profile EXACTLY
  * like a from-scratch full-corpus derivation, which
  * StreamingGraphMaintenanceSpec pins against oracle-checked q151/q194
  * over three whole-order arrivals.
  *
  * 100 TB posture: per batch the work is one within-order self-join
  * bounded by the batch's line counts (never corpus-scale — order size
  * bounds the quadratic term, the same bound the offline build relies
  * on); segments carry fixed-width id pairs; the probe's dedup shuffle
  * keys on two longs, and [[DeltaDirs.compact]]'s tiered folds bound
  * the segment-listing cost by the cadence, not the stream's age. */
object StreamingGraphMaintenance {

  private val edgesSchema = StructType(Seq(
    StructField("u", LongType),
    StructField("v", LongType)))

  /** The accumulated delta edges across all landed batches (additive
    * segments need no strictly-before filtering at probe time; the
    * probe's keyed dedup absorbs cross-segment repeats). */
  def deltaEdges(s: SparkSession, deltaDir: String): DataFrame =
    DeltaDirs.readSegs(s, deltaDir, "edges", edgesSchema)

  /** The foreachBatch function: derive the batch's within-order edges,
    * append its (u, v) segment. Every frame derives from `batch` alone.
    * Every `compactEvery` batches the accumulated segments fold into
    * tiered compacted dirs (0 disables). */
  def graphMaintain(deltaDir: String, compactEvery: Int = 500)
      (batch: DataFrame, batchId: Long): Unit = {
    graft.ops.GraphOps.edgesOf(batch)
      .write.mode("overwrite").parquet(s"$deltaDir/b$batchId/edges")
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      DeltaDirs.compact(batch.sparkSession, deltaDir,
        Seq("edges" -> edgesSchema), batchId)
  }

  /** Degree profile over staged base ∪ streamed delta edges — q151's
    * output shape through its exact shared tail, byte-for-byte the
    * full-corpus profile when base+delta cover the corpus. */
  def degreeProbe(s: SparkSession, baseEdges: DataFrame,
      deltaDir: String): DataFrame =
    graft.ops.GraphOps.degreeProfileOf(graft.Materialize.stable(
      baseEdges.unionByName(deltaEdges(s, deltaDir))
        .dropDuplicates("u", "v")))
}
