package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Streaming maintenance of the distilled quality-classifier fit — the
  * SELECTION member of the streaming-maintenance matrix (digests,
  * bands, postings, IVF lists, semdedup components, and media
  * fingerprints all stream; the classifier is the last family whose
  * state was batch-only). The fit's state is the per-bucket teacher
  * counts (bucket, cp, cn) — plain BIGINTs from
  * [[graft.llm.SelectionOps.classifierCounts]] — so maintenance is the
  * simplest possible delta algebra: per micro-batch of (doc_id, text)
  * arrivals, label and count ONLY the batch and append one
  * `counts/` segment under `delta/b<id>/`. Purely additive, like the
  * posting family: the segment depends on nothing but the batch, so
  * replay of an unacknowledged batch is idempotent by construction
  * (batch-id-keyed overwrite), with no earlier-segment read to get
  * wrong.
  *
  * [[scoredProbe]] is the refit-and-score path: base counts ∪ delta
  * counts → one ≤ B-row merge → log-odds transform → the same fused
  * scoring kernel as q183 — so the integrity contract carries over
  * verbatim: the streamed fit must score EXACTLY like a from-scratch
  * full-corpus fit (pinned by StreamingClassifierMaintenanceSpec
  * against oracle-checked q183 over three file arrivals).
  *
  * 100 TB posture: per batch the work is one O(batch) label+explode
  * with map-side combine into ≤ 65536 rows — nothing corpus-scale
  * moves; the refit itself is arithmetic over a ≤ B-row frame. The
  * base counts are the offline fit's published parquet, rebuilt on its
  * own cadence with the delta segments folded in ([[DeltaDirs.compact]]
  * bounds the probe-time listing cost in between). */
object StreamingClassifierMaintenance {

  private val countsSchema = StructType(Seq(
    StructField("bucket", StringType),
    StructField("cp", LongType),
    StructField("cn", LongType)))

  /** The accumulated delta counts across all landed batches (additive
    * segments need no strictly-before filtering at probe time). */
  def deltaCounts(s: SparkSession, deltaDir: String): DataFrame =
    DeltaDirs.readSegs(s, deltaDir, "counts", countsSchema)

  /** The foreachBatch function: label + bucket-count the batch, append
    * its counts segment. Every frame derives from `batch` alone. Every
    * `compactEvery` batches the accumulated segments fold into one
    * compacted dir so listing cost is bounded by the cadence (0
    * disables).
    *
    * Arrival contract: docs must be FIRST-SEEN — same disjointness the
    * IVF/semdedup maintainers require of vecArrivals (ADVICE r12). The
    * counts algebra is a SUM, so a doc re-delivered in a later batch
    * (not a replay of the same batchId, which the keyed overwrite
    * absorbs) double-counts its buckets and skews the refit toward
    * re-crawled content. A recrawl stream must dedup upstream (the
    * digest maintainer is exactly that filter) before feeding this
    * family. */
  def classifierMaintain(deltaDir: String, compactEvery: Int = 500)
      (batch: DataFrame, batchId: Long): Unit = {
    graft.llm.SelectionOps.classifierCounts(batch)
      .write.mode("overwrite").parquet(s"$deltaDir/b$batchId/counts")
    if (compactEvery > 0 && batchId > 0 && batchId % compactEvery == 0)
      DeltaDirs.compact(batch.sparkSession, deltaDir,
        Seq("counts" -> countsSchema), batchId)
  }

  /** Refit over base ∪ delta counts and score the corpus at `dir` with
    * the fused kernel — q183's output shape, byte-for-byte q183's
    * result when base+delta cover the corpus. */
  def scoredProbe(s: SparkSession, dir: String, baseCounts: DataFrame,
      deltaDir: String): DataFrame = {
    import graft.llm.SelectionOps._
    val merged = baseCounts.unionByName(deltaCounts(s, deltaDir))
      .groupBy("bucket")
      .agg(sum(col("cp")).as("cp"), sum(col("cn")).as("cn"))
    scoredDocsWith(s, dir, weightVectorOf(s, countsToWeights(merged)))
      .orderBy(col("score_micro").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("source"), col("n_grams"),
        col("score_micro"), (col("score_micro") > 0).as("pred_keep"))
  }
}
