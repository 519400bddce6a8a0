package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** TWELFTH streaming-maintainer family: duplicated-SPAN state (the
  * q198/q200 family — Lee et al. 2021) maintained incrementally over
  * an arriving document stream, completing the batch / staged /
  * streamed triple the other families have (r16 verdict item 8).
  *
  * ==State algebra (why this family is subtler than presence)==
  *
  * Span duplication is a COUNT property (a gram is duplicated iff it
  * occurs ≥ 2 times corpus-wide) and duplication is MONOTONE (grams
  * only ever arrive), but a later batch can retroactively flip an
  * EARLIER batch's position from unique to duplicated — and segments
  * are immutable. The trick: per batch land
  *
  *   - `dgn` (dg, n, doc1, pos1): the batch's per-digest gram count,
  *     carrying the position ONLY when n = 1 — exactly the positions a
  *     later batch could flip;
  *   - `runs` (doc_id, s, e): maximal runs of the batch positions
  *     already duplicated at arrival time (vs strictly-earlier state +
  *     the batch itself);
  *   - `totals` (doc_id, source, n_tokens): the report denominator and
  *     the seen-doc set for the re-delivery exclusion.
  *
  * All three fold row-preservingly ([[DeltaDirs]] needs no
  * family-specific merge math): the PROBE resolves flips — a digest
  * whose SUMMED n ≥ 2 is duplicated, and every segment-carried n = 1
  * position of such a digest is a duplicated position that no
  * segment's runs captured. Probe dup positions = (runs exploded back
  * to positions) ∪ (flipped n=1 positions), distinct — both
  * output-sized — then the shared [[graft.llm.TextOps.spanRuns]] /
  * `spanReport` tail. Contract: the probe report ≡
  * [[graft.llm.TextOps.dupSpansOf]] over the union of every delivered
  * doc (spec-pinned; stream ≡ batch, replay idempotence, re-delivery
  * harmlessness).
  *
  * Re-delivery: counts are not presence — a re-delivered doc grammed
  * twice would spuriously duplicate its unique grams — so arriving
  * docs pass [[MaintainerHarness.firstSeen]] against the landed
  * `totals` doc ids (the classifier/IVF exclusion, enforced in code).
  */
object StreamingSpanMaintenance {

  val K: Int = graft.llm.SpanDigestIndex.K

  private[graft] val dgnSchema = StructType(Seq(
    // 16-byte MD5 binary (the fused gram_digests kernel, r17)
    StructField("dg", BinaryType),
    StructField("n", LongType),
    StructField("doc1", LongType),
    StructField("pos1", LongType)))
  private[graft] val runSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("s", LongType),
    StructField("e", LongType)))
  private[graft] val totalSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("n_tokens", LongType)))

  private val subs = Seq(
    "dgn" -> dgnSchema, "runs" -> runSchema, "totals" -> totalSchema)

  /** foreachBatch body: land the batch's (dgn, runs, totals) segments.
    * `batch` must carry (doc_id, text, source). */
  def spanMaintain(deltaDir: String,
      foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(subs, deltaDir, foldSegments) { (ctx, b) =>
      val docs = ctx.pin(MaintainerHarness.firstSeen(
        b, "doc_id", ctx.earlier("totals")))
      val grams = ctx.pin(graft.llm.TextOps.positionalGrams(docs, K))
      val bCnt = ctx.pin(grams.groupBy("dg")
        .agg(count(lit(1)).as("n"),
          min(struct(col("doc_id"), col("pos"))).as("first")))
      // already-duplicated at arrival: >= 2 within the batch, or >= 1
      // in strictly-earlier state. The earlier-state read is pruned to
      // the BATCH's digests before aggregating (left-semi against the
      // batch's own small digest set): the sum only matters for grams
      // the batch carries, so the per-batch agg is O(matched rows),
      // not O(every digest ever seen) — the difference between a
      // batch-sized and a corpus-sized hash agg per micro-batch.
      val earlierN = ctx.earlier("dgn")
        .join(bCnt.select("dg"), Seq("dg"), "left_semi")
        .groupBy("dg").agg(sum(col("n")).as("en"))
      val dupNow = bCnt.join(earlierN, Seq("dg"), "left")
        .filter(col("n") + coalesce(col("en"), lit(0L)) >= 2)
        .select("dg")
      val batchDupPos = grams.join(dupNow, Seq("dg"), "left_semi")
        .select("doc_id", "pos")
      Map(
        "dgn" -> bCnt.select(col("dg"), col("n"),
          when(col("n") === 1, col("first.doc_id")).as("doc1"),
          when(col("n") === 1, col("first.pos")).as("pos1")),
        "runs" -> graft.llm.TextOps.spanRuns(batchDupPos),
        "totals" -> graft.llm.TextOps.spanTotals(docs))
    } (batch, batchId)

  /** The q198 report over ALL landed state — flip resolution at probe
    * time (scaladoc above), then the shared runs/report tail. */
  def report(s: SparkSession, deltaDir: String): DataFrame = {
    val dgn = MaintainerHarness.delta(s, deltaDir, "dgn", dgnSchema)
    val runs = MaintainerHarness.delta(s, deltaDir, "runs", runSchema)
    val totals = MaintainerHarness.delta(s, deltaDir, "totals", totalSchema)
    val dupDg = dgn.groupBy("dg").agg(sum(col("n")).as("tn"))
      .filter(col("tn") >= 2).select("dg")
    val flipped = dgn.filter(col("n") === 1)
      .join(dupDg, Seq("dg"), "left_semi")
      .select(col("doc1").as("doc_id"), col("pos1").as("pos"))
    val runPos = runs
      .select(col("doc_id"), explode(sequence(col("s"), col("e"))).as("pos"))
    val dupPos = runPos.unionByName(flipped).distinct()
    graft.llm.TextOps.spanReport(
      graft.llm.TextOps.spanRuns(dupPos), totals, K)
  }
}
