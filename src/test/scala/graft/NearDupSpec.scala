package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{NearDupOps, VectorOps}

/** Value-level verification of the probabilistic near-dup operators
  * against controlled fixtures (the DuckDB oracle covers only exact
  * Jaccard; MinHash/SimHash hash with xxhash64 which DuckDB lacks). */
class NearDupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away home tonight"
  /** near-dup: one word changed at the end */
  private val nearDup = base.replace("tonight", "today")
  private val different =
    "spark executes distributed query plans with columnar parquet scans and hash joins"

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("neardup").toString
    Seq(
      (0L, base, "en", "src0", base.length.toLong),
      (1L, nearDup, "en", "src0", nearDup.length.toLong),
      (2L, different, "en", "src1", different.length.toLong),
      (3L, base, "en", "src2", base.length.toLong) // exact copy of doc 0
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("exact copies collide in every band; jaccard 1.0") {
    val pairs = NearDupOps.minhashPairs(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((0L, 3L)) == 8, "identical docs must share all 8 bands")
    val jac = NearDupOps.ngramJaccard(spark, fixtureDir)
      .filter(col("doc_a") === 0 && col("doc_b") === 3)
      .select("jaccard").head.getDouble(0)
    assert(jac == 1.0)
  }

  test("near-duplicates are candidates; unrelated docs are not") {
    val pairs = NearDupOps.minhashPairs(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 1L)), "one-word-changed doc must collide in ≥1 band")
    assert(!pairs.contains((0L, 2L)), "unrelated docs must not be candidates")
    assert(!pairs.contains((1L, 2L)))
  }

  test("minhash candidate set tracks exact jaccard ranking") {
    val jac = NearDupOps.ngramJaccard(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    // the near-dup pair must have high but <1 similarity
    assert(jac((0L, 1L)) > 0.7 && jac((0L, 1L)) < 1.0)
    // unrelated pair shares no 3-grams → absent from join-based jaccard
    assert(!jac.contains((0L, 2L)))
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val sh = NearDupOps.simhash(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(sh(0L) == sh(3L))
    assert(hamming(sh(0L), sh(1L)) < hamming(sh(0L), sh(2L)),
      s"near-dup hamming ${hamming(sh(0L), sh(1L))} should be < unrelated ${hamming(sh(0L), sh(2L))}")
    assert(hamming(sh(0L), sh(1L)) <= 12)
  }

  test("cosine top-k is symmetric-sane and correctly ranked") {
    val topk = VectorOps.cosineTopK(spark, sfDir).collect()
    val byQuery = topk.groupBy(_.getLong(0))
    assert(byQuery.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQuery.values.foreach { rows =>
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.length == 10)
      assert(sims.sameElements(sims.sortBy(-(_: Double))), "ranks must follow sim desc")
    }
  }

  test("fused shingle_minhash equals signature over explicit shingles") {
    import graft.functions.HashKernels
    val docs = Tables.t(spark, sfDir, "documents").limit(100)
    val fused = docs.select(col("doc_id"),
      HashKernels.shingle_minhash(col("text"), 3, 32).as("sig"))
      .filter(col("sig").isNotNull)
    val composed = docs.select(col("doc_id"),
      NearDupOps.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id"), HashKernels.minhash_signature(col("sh"), 32).as("sig"))
    val a = fused.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = composed.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a == b)
  }

  test("fused simhash equals composed simhash bit-for-bit") {
    val a = NearDupOps.simhash(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = NearDupOps.simhashComposed(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("hashed-TF vectors: unit norm, deterministic, dup-doc recall") {
    import graft.functions.HashKernels.hashed_tf_vector
    import graft.functions.VectorFunctions.cosine_sim
    val docs = Tables.t(spark, sfDir, "documents").limit(50)
      .select(col("doc_id"), hashed_tf_vector(col("text"), 64).as("v"))
    val norms = docs.select(
      graft.functions.VectorFunctions.dot_product(col("v"), col("v")).as("n2"),
      size(col("v")).as("d")).collect()
    assert(norms.forall(_.getInt(1) == 64))
    assert(norms.forall(r => r.getDouble(0) == 0.0 || math.abs(r.getDouble(0) - 1.0) < 1e-6))
    // the planted-duplicate corpus: exact copies must appear at sim ~1
    val pairs = NearDupOps.docEmbedNearDup(spark, fixtureDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(pairs((0L, 3L)) - 1.0) < 1e-9, "exact copies at cosine 1")
    assert(pairs.contains((0L, 1L)), "near-dup (one word changed) found")
    assert(!pairs.contains((0L, 2L)), "unrelated docs not near-dups")
  }

  test("minhash signature agreement estimates jaccard within sketch error") {
    import graft.functions.HashKernels.shingle_minhash
    // estimator: fraction of equal positions in two k=128 signatures
    // ≈ true Jaccard, stderr ≈ sqrt(J(1-J)/k) ≈ 0.04
    val k = 128
    val pairs = NearDupOps.ngramJaccard(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap
    val sigs = graft.Tables.t(spark, sfDir, "documents")
      .filter(col("doc_id") < 60)
      .select(col("doc_id"), shingle_minhash(col("text"), 3, k).as("sig"))
      .filter(col("sig").isNotNull)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val checked = pairs.toSeq.filter(_._2 > 0.05).take(20)
    assert(checked.nonEmpty)
    checked.foreach { case ((a, b), jac) =>
      val est = sigs(a).zip(sigs(b)).count { case (x, y) => x == y }.toDouble / k
      assert(math.abs(est - jac) < 0.15,
        s"pair ($a,$b): estimate $est vs exact $jac")
    }
  }

  test("winnowing fingerprints survive a prefix shift (rolling-hash property)") {
    import graft.functions.HashKernels.winnow_fingerprint
    import spark.implicits._
    val shifted = "NEW PREFIX WORDS HERE " + base
    val fps = Seq((0L, base), (1L, shifted), (2L, different))
      .toDF("doc_id", "text")
      .select(col("doc_id"), winnow_fingerprint(col("text"), 8, 16).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def overlap(a: Set[Long], b: Set[Long]) =
      a.intersect(b).size.toDouble / math.min(a.size, b.size)
    assert(overlap(fps(0L), fps(1L)) > 0.6,
      s"prefix-shifted doc must share most fingerprints, got ${overlap(fps(0L), fps(1L))}")
    assert(overlap(fps(0L), fps(2L)) < 0.2,
      "unrelated docs must share almost none")
  }

  test("shingling guards short documents") {
    val df = Seq((0L, "one two"), (1L, ""), (2L, "a b c d"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), NearDupOps.shingles(col("text"), 3).as("sh"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(m(0L).isEmpty)
    assert(m(1L).isEmpty)
    assert(m(2L) == Seq("a b c", "b c d"))
  }
}
