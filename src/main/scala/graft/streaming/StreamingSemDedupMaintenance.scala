package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Streaming maintenance of the semantic-dedup cluster state — the
  * embedding member of the streaming-maintenance matrix, completing it:
  * with this, every staged index family (exact digests, MinHash bands,
  * BM25 postings, IVF lists, SemDedup components) has digest → band →
  * posting → list → component maintenance under continuous ingest.
  *
  * Per micro-batch of (label, vec_id, embedding) arrivals:
  *   1. cosine edges between the batch and every same-cluster-key
  *      vector seen so far — staged base side ∪ delta vectors from
  *      STRICTLY EARLIER batches ∪ the batch itself (within-batch
  *      near-dups are edges too, exactly q170's batch × all rule);
  *      threshold and rounding identical to q90/q170/q171
  *      (round(cos, 4) ≥ 0.35);
  *   2. the edges append to `delta/b<id>/edges`, the batch's vectors
  *      (with precomputed norms) to `delta/b<id>/vecs` — the "seen so
  *      far" side of later batches.
  * Batch-id-keyed overwrites + strictly-before reads make replay of an
  * unacknowledged batch byte-idempotent (the dedupMaintain lesson).
  *
  * [[componentsWithDelta]] is the read path: connected components over
  * the staged index's star edges ∪ all delta edges, shaped exactly like
  * q171's cluster table. Because the union of per-batch edge sets over
  * any arrival order equals q170's batch-touching edge set for the
  * union batch, the streamed state is EXACTLY the single-shot
  * add-batch's — StreamingSemDedupMaintenanceSpec pins stream-grown ≡
  * q171 ≡ (by q171's own oracle) a from-scratch dedup of the full
  * corpus, over three file arrivals.
  *
  * 100 TB posture: per batch the similarity work is O(batch · cluster
  * width) — never old×old — and the component merge runs on star edges
  * (linear in cluster membership), not pairwise edges. The cluster-key
  * granularity must grow with the corpus (k ≈ n/1000, the SemDeDup
  * recipe; see ScaleSoak's label rule) for "cluster width" to stay
  * bounded. */
object StreamingSemDedupMaintenance {

  private def segSchema(sub: String): StructType = sub match {
    case "vecs" => StructType(Seq(StructField("label", IntegerType),
      StructField("vec_id", LongType),
      StructField("v", ArrayType(FloatType)),
      StructField("norm", DoubleType)))
    case "edges" => StructType(Seq(StructField("id_a", LongType),
      StructField("id_b", LongType)))
  }

  private def deltaSeg(s: SparkSession, deltaDir: String,
      sub: String): DataFrame =
    MaintainerHarness.delta(s, deltaDir, sub, segSchema(sub))

  private def withNorm(vecs: DataFrame): DataFrame = {
    import graft.functions.VectorFunctions.dot_product
    vecs.select(col("label").cast("int").as("label"), col("vec_id"),
      col("embedding").as("v"),
      sqrt(dot_product(col("embedding"), col("embedding"))).as("norm"))
  }

  /** The foreachBatch function. `basePrepared` is the staged PREPARED
    * corpus side — (label, vec_id, v, norm), i.e. the
    * [[graft.llm.SemDedupIndex]] `corpus/` table — NOT raw embeddings:
    * corpus-side norms are corpus-constant, and recomputing them per
    * micro-batch is exactly the per-ingest waste q171's staging
    * removed (this maintainer originally took raw vectors and paid a
    * full-corpus norm pass every batch). Callers with only raw
    * embeddings prepare them once via [[prepared]]. */
  def semDedupMaintain(basePrepared: DataFrame, deltaDir: String,
      foldSegments: Int = MaintainerHarness.FoldSegmentsDefault)
      (batch: DataFrame, batchId: Long): Unit =
    MaintainerHarness.maintain(
      Seq("edges", "vecs").map(x => x -> segSchema(x)), deltaDir,
      foldSegments) { (ctx, raw) =>
      import graft.functions.VectorFunctions.dot_product
      // First-seen enforcement (VERDICT r14 item 1's feeder audit):
      // the family's read path counts VEC ROWS (componentsWithDelta's
      // membership frame), so a vec_id re-delivered in a later batch —
      // recrawl steady state, not replay — would duplicate its vecs
      // row, double-count n_members, and grow state with deliveries
      // rather than distinct vectors. The whole-arrival promise is
      // code: the batch dedups on vec_id and anti-joins (ids-only)
      // against base ∪ strictly-earlier vecs before any edge work.
      // Replay stays idempotent — the exclusion reads only state a
      // replaying batch cannot have changed.
      val seenIds = basePrepared.select(col("vec_id"))
        .unionByName(ctx.earlier("vecs").select("vec_id"))
      val b = ctx.pin(
        MaintainerHarness.firstSeen(withNorm(raw), "vec_id", seenIds)
          .select("label", "vec_id", "v", "norm"))
      val seen = basePrepared.select("label", "vec_id", "v", "norm")
        .unionByName(ctx.earlier("vecs"))
        .unionByName(b)
      val ba = b.select(col("label"), col("vec_id").as("id_a"),
        col("v").as("va"), col("norm").as("na"))
      val edges = ba.join(
          seen.select(col("label"), col("vec_id").as("id_b"),
            col("v").as("vb"), col("norm").as("nb")), Seq("label"))
        .filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"),
          round(dot_product(col("va"), col("vb")) / (col("na") * col("nb")), 4)
            .as("sim"))
        .filter(col("sim") >= 0.35)
        .select(col("id_a"), col("id_b")).distinct()
      Map("edges" -> edges, "vecs" -> b.select("label", "vec_id", "v", "norm"))
    }(batch, batchId)

  /** Prepare a raw (label, vec_id, embedding) corpus side ONCE for
    * [[semDedupMaintain]] — the inline stand-in for reading the staged
    * SemDedupIndex `corpus/` parquet. */
  def prepared(baseVecs: DataFrame): DataFrame = withNorm(baseVecs)

  /** The q171-shaped cluster table over base ∪ streamed arrivals:
    * components over the staged star edges plus every delta edge.
    * `basePrepared` as in [[semDedupMaintain]] (only its 2-column
    * (vec_id, label) projection is read here). */
  def componentsWithDelta(s: SparkSession, basePrepared: DataFrame,
      stagedComponents: DataFrame, deltaDir: String): DataFrame = {
    val starEdges = stagedComponents
      .filter(col("vec_id") =!= col("component"))
      .select(col("component").as("id_a"), col("vec_id").as("id_b"))
    val comp = graft.llm.Graphs.connectedComponents(
        starEdges.unionByName(deltaSeg(s, deltaDir, "edges")))
      .select(col("id").as("vec_id"), col("component"))
    val e = basePrepared.select("vec_id", "label")
      .unionByName(deltaSeg(s, deltaDir, "vecs").select("vec_id", "label"))
    val wc = Window.partitionBy("cluster_id")
    e.join(comp, Seq("vec_id"), "left")
      .select(col("vec_id"), col("label"),
        coalesce(col("component"), col("vec_id")).as("cluster_id"))
      .withColumn("n_members", count(lit(1)).over(wc))
      .withColumn("keep", col("vec_id") === col("cluster_id"))
      .orderBy("vec_id")
  }
}
