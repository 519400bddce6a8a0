package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.VectorOps

/** Value-level checks for the embedding-space curation operators:
  * semantic dedup (q90, the SemDeDup shape) and centroid-distance
  * outlier scoring (q91). The DuckDB oracle pins both on the driver
  * tables; these fixtures pin the semantics a hash can't explain —
  * cluster-restricted comparison, transitive merge, robust-gate
  * behavior around a planted outlier. */
class SemanticOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("pair-cosine calibration separates near-dup pairs from the baseline") {
    val d = java.nio.file.Files.createTempDirectory("calib").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    // docs 0,1 are a lexical near-dup pair with IDENTICAL embeddings;
    // docs 2-5 are distinct texts with mutually orthogonal embeddings.
    val texts = Seq((0L, base), (1L, base),
      (2L, "one two three four five six"), (3L, "sieben acht neun zehn elf"),
      (4L, "uno dos tres cuatro cinco"), (5L, "un deux trois quatre cinq"))
    texts.map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    def unit(i: Int): Seq[Float] = (0 until 8).map(j => if (j == i) 1f else 0f)
    Seq((0L, unit(0), 0), (1L, unit(0), 0), (2L, unit(2), 0),
        (3L, unit(3), 0), (4L, unit(4), 0), (5L, unit(5), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = VectorOps.pairCosineCalibration(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("near_dup") == ((1L, 1.0)), "identical pair at cosine exactly 1")
    // partner rule on 6 docs yields 6 normalized pairs; (0,1) is
    // anti-joined away as a true near-dup → 5 baseline pairs, all
    // orthogonal except (0,1)-adjacent ones touching doc 0/1's axis
    assert(r("random")._1 == 5L)
    assert(r("random")._2 < 0.5, "baseline mean stays far below the dup mean")
  }

  private def embDir(rows: Seq[(Long, Seq[Float], Int)]): String = {
    val d = java.nio.file.Files.createTempDirectory("semops").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("semantic dedup merges transitively within a cluster, never across") {
    val e1 = Seq(1f, 0f, 0f, 0f)
    val d = embDir(Seq(
      (0L, e1, 0),                            // cluster 0 prototype
      (1L, Seq(1f, 0.02f, 0f, 0f), 0),        // cos ≈ 1 with 0
      (2L, Seq(1f, 0.04f, 0.01f, 0f), 0),     // cos ≈ 1 with 0 and 1
      (3L, Seq(0f, 1f, 0f, 0f), 0),           // orthogonal → own cluster
      (4L, e1, 1)))                           // identical to 0 but other cluster
    val r = VectorOps.semanticDedup(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert((0L to 2L).forall(i => r(i).getLong(2) == 0L),
      "near-identical same-label vectors form one component")
    assert(r(0L).getLong(3) == 3 && r(0L).getBoolean(4), "min id is canonical")
    assert(!r(1L).getBoolean(4) && !r(2L).getBoolean(4))
    assert(r(3L).getLong(2) == 3L && r(3L).getBoolean(4),
      "orthogonal vector survives as its own cluster")
    assert(r(4L).getLong(2) == 4L && r(4L).getBoolean(4),
      "an identical vector in ANOTHER cluster is never compared — " +
        "SemDeDup's comparisons are cluster-local by construction")
  }

  test("centroid outliers: robust gate flags the planted far vector only") {
    // five jittered members near (1,0,0,0) plus one far outlier; the
    // centroid shifts toward the outlier, but median+3·MAD is immune
    val d = embDir(Seq(
      (0L, Seq(1.00f, 0.01f, 0f, 0f), 0),
      (1L, Seq(0.99f, 0.00f, 0f, 0f), 0),
      (2L, Seq(1.01f, -0.01f, 0f, 0f), 0),
      (3L, Seq(1.00f, 0.00f, 0.01f, 0f), 0),
      (4L, Seq(0.98f, 0.02f, 0f, 0f), 0),
      (5L, Seq(0f, 0f, 10f, 0f), 0)))
    val r = VectorOps.centroidOutliers(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(5L).getBoolean(5), "far vector must be flagged")
    assert((0L to 4L).forall(i => !r(i).getBoolean(5)),
      "tight-cluster members stay unflagged")
    val med = r(0L).getDouble(3)
    val mad = r(0L).getDouble(4)
    assert(med > 0 && mad >= 0 && r(5L).getDouble(2) > med + 3 * mad)
    // med/mad are order statistics OF THE INPUT distances — membership,
    // not interpolation (the cross-engine-exact property the histogram
    // form buys)
    val dists = (0L to 5L).map(i => r(i).getDouble(2)).toSet
    assert(dists.contains(med), "median must be an input value")
  }

  test("q90/q91 run non-degenerate on the sf0.001 fixture") {
    for (name <- Seq("q90_semantic_dedup", "q91_centroid_outliers")) {
      val n = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      assert(n > 0, s"$name returned no rows on the fixture")
    }
  }

  test("kNN label: planted clusters predict their own label, queries never self-vote") {
    // Three tight clusters on orthogonal axes; vec_ids chosen so 0, 50,
    // 100 are the % 50 == 0 query hold-outs, one per cluster. Every
    // neighbor of a query is its own cluster → unanimous correct vote.
    def jit(axis: Int, eps: Float): Seq[Float] = {
      val v = Array(0f, 0f, 0f, 0f); v(axis) = 1f; v((axis + 1) % 4) = eps
      v.toSeq
    }
    val rows =
      (Seq((0L, 0), (50L, 1), (100L, 2)).map { case (id, ax) => (id, jit(ax, 0f), ax) }) ++
      (1L to 12L).map(i => (i, jit(0, 0.01f * i), 0)) ++
      (51L to 62L).map(i => (i, jit(1, 0.01f * (i - 50)), 1)) ++
      (101L to 112L).map(i => (i, jit(2, 0.01f * (i - 100)), 2))
    val d = embDir(rows)
    val got = VectorOps.knnLabel(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.map(_._1).toSeq == Seq(0L, 50L, 100L), "one row per hold-out query")
    got.foreach { case (q, truth, pred, votes, correct) =>
      assert(pred == truth && correct, s"query $q predicted $pred, wanted $truth")
      assert(votes == 10L, s"query $q: unanimous 10-vote neighborhood, got $votes")
    }
  }

  test("kNN label: majority vote tie-break is deterministic (count desc, label asc)") {
    // One query equidistant from two 5-member clusters with labels 2 and
    // 1 → 5-5 tie at k = 10 → smaller label wins.
    val d = embDir(
      Seq((0L, Seq(1f, 1f, 0f, 0f), 9)) ++
      (1L to 5L).map(i => (i, Seq(1f, 0.001f * i, 0f, 0f), 2)) ++
      (6L to 10L).map(i => (i, Seq(0.001f * (i - 5), 1f, 0f, 0f), 1)))
    val r = VectorOps.knnLabel(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getLong(2) == 1L, "5-5 tie must resolve to the smaller label")
    assert(r.head.getLong(3) == 5L)
    assert(!r.head.getBoolean(4))
  }

  test("embedding health: orthogonal cluster scores 0.5, collapsed cluster 1, zeros counted") {
    // label 0: the four axis unit vectors — norms exactly 1 (sd 0),
    // centroid (¼,¼,¼,¼) with norm ½ → anisotropy 0.5.
    // label 1: three identical unit vectors → anisotropy exactly 1.
    // label 2: one unit vector plus a zero vector → n_zero = 1.
    def unit(i: Int): Seq[Float] = (0 until 4).map(j => if (j == i) 1f else 0f)
    val rows =
      (0 until 4).map(i => (i.toLong, unit(i), 0)) ++
      Seq((10L, unit(0), 1), (11L, unit(0), 1), (12L, unit(0), 1)) ++
      Seq((20L, unit(1), 2), (21L, Seq(0f, 0f, 0f, 0f), 2))
    val d = embDir(rows)
    val r = VectorOps.embeddingHealth(spark, d).collect()
      .map(x => x.getInt(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3),
        x.getDouble(4), x.getDouble(5), x.getDouble(6)))).toMap
    assert(r(0) == ((4L, 0L, 1.0, 0.0, 0.5, 0.5)),
      "orthogonal axes: mean norm 1, centroid norm 0.5, anisotropy 0.5")
    assert(r(1) == ((3L, 0L, 1.0, 0.0, 1.0, 1.0)),
      "a collapsed cluster is maximally anisotropic")
    val (n2, z2, m2, _, c2, a2) = r(2)
    assert(n2 == 2L && z2 == 1L, "zero vector counted")
    assert(m2 == 0.5 && c2 == 0.5 && a2 == 1.0)
  }

  test("incremental semantic dedup equals from-scratch dedup on the driver fixture") {
    val fresh = VectorOps.semanticDedup(spark, sfDir).collect().map(_.toSeq).toSeq
    val staged = VectorOps.semanticDedupAddBatch(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(staged == fresh,
      "staged-components + batch-edges path must reproduce a full dedup")
    // and the production form reading the staged PARQUET index agrees
    val fromIndex = VectorOps.semanticDedupStaged(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(fromIndex == fresh,
      "SemDedupIndex-backed probe must reproduce a full dedup")
  }

  test("incremental semantic dedup handles join and MERGE of staged clusters") {
    // Staged corpus (vec_id % 10 != 7): clusters {1,2} on axis 0 and
    // {3,4} on axis 1, plus singleton 5 on axis 2 — axes are orthogonal
    // so the staged partition has two 2-clusters. The batch (17, 27):
    // 17 is the diagonal bridge between axes 0 and 1 (cos 0.707 ≥ 0.35
    // to all of 1..4) → its arrival must MERGE the two staged clusters;
    // 27 is a fresh singleton on axis 3.
    def v(x: Float, y: Float, z: Float, w: Float) = Seq(x, y, z, w)
    val rows = Seq(
      (1L, v(1, 0, 0, 0), 0), (2L, v(1, 0.01f, 0, 0), 0),
      (3L, v(0, 1, 0, 0), 0), (4L, v(0.01f, 1, 0, 0), 0),
      (5L, v(0, 0, 1, 0), 0),
      (17L, v(1, 1, 0, 0), 0),
      (27L, v(0, 0, 0, 1), 0))
    val d = embDir(rows)
    val got = VectorOps.semanticDedupAddBatch(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getLong(3), r.getBoolean(4))))
      .toMap
    Seq(1L, 2L, 3L, 4L, 17L).foreach { id =>
      assert(got(id)._1 == 1L && got(id)._2 == 5L,
        s"vec $id must land in the merged 5-member cluster rooted at 1")
    }
    assert(got(1L)._3 && !got(17L)._3, "representative is the min id")
    assert(got(27L) == ((27L, 1L, true)), "new singleton keeps itself")
    assert(got(5L) == ((5L, 1L, true)), "staged singleton untouched")
    // and the incremental result still equals a from-scratch dedup here
    val fresh = VectorOps.semanticDedup(spark, d).collect().map(_.toSeq).toSeq
    val staged = VectorOps.semanticDedupAddBatch(spark, d).collect().map(_.toSeq).toSeq
    assert(staged == fresh)
  }
}
