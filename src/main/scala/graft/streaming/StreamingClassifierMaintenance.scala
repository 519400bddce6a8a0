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
  * arrivals, label and count ONLY the batch's first-seen docs and
  * append one `counts/` segment (plus the counted ids as `docs/`)
  * under `delta/b<id>/`. Additive like the posting family, but the
  * SUM algebra cannot absorb re-delivered docs the way the paragraph
  * family's presence algebra can — so the maintainer enforces the
  * exclusion itself: an anti-join against the ids counted by the base
  * fit and by strictly earlier batches (see [[classifierMaintain]]).
  * Replay of an unacknowledged batch stays idempotent because the
  * seen-set read is STRICTLY BEFORE the replaying batch's id — state
  * replay cannot have changed — and the writes are batch-id-keyed
  * overwrites.
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

  private val docsSchema = StructType(Seq(
    StructField("doc_id", LongType)))

  /** The accumulated delta counts across all landed batches (additive
    * segments need no strictly-before filtering at probe time). */
  def deltaCounts(s: SparkSession, deltaDir: String): DataFrame =
    MaintainerHarness.delta(s, deltaDir, "counts", countsSchema)

  /** The foreachBatch function: label + bucket-count the batch's
    * FIRST-SEEN docs, append their counts segment plus a `docs/`
    * segment of the ids it counted. When `foldSegments` live segments accumulate the
    * accumulated segments fold into tiered compacted dirs so listing
    * cost is bounded by the cadence (0 disables).
    *
    * Re-delivery enforcement (VERDICT r13 item 1): the counts algebra
    * is a SUM, so a doc re-delivered in a later batch — the steady
    * state of a recrawl stream, NOT a replay of the same batchId —
    * would double-count its teacher buckets and silently break the
    * q185 ≡ q183 contract. The exclusion is now code, not prose: the
    * batch is deduped on doc_id and anti-joined against
    * `baseSeen` ∪ the `docs/` segments of STRICTLY EARLIER batches
    * before counting, so each doc id is counted at most once across
    * the stream's life. The strictly-before read
    * ([[DeltaDirs.readSegs]] with this batchId) is what keeps replay
    * idempotent: a replayed batch never sees its own crashed attempt's
    * `docs/` segment (which would make every doc look already-seen and
    * fold the segment to empty), and both writes derive from state
    * that replay cannot have changed, so the keyed overwrite lands
    * byte-identical rows.
    *
    * `baseSeen` carries the doc ids the OFFLINE fit already counted
    * (the ids behind the published base counts parquet); omitted, only
    * intra-stream re-deliveries are excluded. Cost: the seen set is
    * ids-only — 8 bytes per counted doc — and the anti-join output is
    * batch-sized; at warehouse scale the base side is bucketed by
    * doc_id (the S7 layout) so the join co-locates. */
  def classifierMaintain(deltaDir: String, baseSeen: Option[DataFrame] = None,
      foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)(batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(
      Seq("counts" -> countsSchema, "docs" -> docsSchema), deltaDir,
      foldSegments) { (ctx, b) =>
      val seenBefore = ctx.earlier("docs")
      val seen = baseSeen.fold(seenBefore)(x =>
        seenBefore.unionByName(x.select(col("doc_id"))))
      val fresh = ctx.pin(MaintainerHarness.firstSeen(
        b.select(col("doc_id"), col("text")), "doc_id", seen))
      Map(
        "counts" -> graft.llm.SelectionOps.classifierCounts(fresh),
        "docs" -> fresh.select("doc_id"))
    }(batch, batchId)

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
