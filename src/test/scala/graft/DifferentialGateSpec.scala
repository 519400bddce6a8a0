package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{NearDupOps, VectorOps}

/** The differential gate the probabilistic dedup oracles rest on.
  *
  * q43/q48/q49's full oracle equality is only as good as candidate
  * recall at the verify threshold ON THE CURRENT FIXTURES — a
  * regenerated fixture with a new boundary pair could silently turn the
  * LSH output into a strict subset of the brute-force oracle and fail
  * the driver's hash compare with no diagnosis. This suite recomputes
  * the brute-force thresholded pair set at every CI run and diffs it
  * against the pipelines pair-by-pair, so a fixture change fails HERE
  * with named pairs and their exact similarities, before the oracle
  * run. (sf0.1 is covered by the same check run from tools/ScaleSoak;
  * CI keeps to sf0.001 + sf0.01 — the driver's oracle scale.)
  */
class DifferentialGateSpec extends AnyFunSuite {
  import TestSpark._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def pairStats(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(4)).toMap

  private def diff(name: String, got: Map[(Long, Long), Double],
      want: Map[(Long, Long), Double]): Unit = {
    val missing = (want.keySet -- got.keySet).toSeq.sorted
      .map(p => s"$p jaccard=${want(p)}")
    val extra = (got.keySet -- want.keySet).toSeq.sorted
      .map(p => s"$p jaccard=${got(p)}")
    assert(missing.isEmpty && extra.isEmpty,
      s"$name recall/soundness break — " +
        s"missing=${missing.mkString("[", "; ", "]")} " +
        s"extra=${extra.mkString("[", "; ", "]")}")
  }

  test("q43 minhash near-dup equals brute-force jaccard >= 0.8 at every fixture scale") {
    dirs.foreach { dir =>
      val want = pairStats(NearDupOps.exactNearDupBrute(spark, dir, 0.8))
      val got = pairStats(NearDupOps.minhashNearDup(spark, dir))
      diff(s"q43@$dir", got, want)
    }
  }

  test("q49 doc-embed near-dup equals brute-force jaccard >= 0.9 at every fixture scale") {
    dirs.foreach { dir =>
      val want = pairStats(NearDupOps.exactNearDupBrute(spark, dir, 0.9))
      val got = pairStats(NearDupOps.docEmbedNearDup(spark, dir))
      diff(s"q49@$dir", got, want)
    }
  }

  test("q48 embed near-dup equals brute-force cosine > 0.8 (twins included)") {
    import graft.functions.VectorFunctions.dot_product
    dirs.foreach { dir =>
      val base = Tables.t(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      val twins = base.filter(col("vec_id") < 25)
        .select((col("vec_id") + lit(1000000L)).as("vec_id"), col("embedding"))
      val e = base.unionByName(twins)
        .select(col("vec_id"), col("embedding").as("v"),
          sqrt(dot_product(col("embedding"), col("embedding"))).as("norm"))
      val a = e.select(col("vec_id").as("id_a"), col("v").as("va"), col("norm").as("na"))
      val b = e.select(col("vec_id").as("id_b"), col("v").as("vb"), col("norm").as("nb"))
      val want = a.join(b, col("id_a") < col("id_b"))
        .select(col("id_a"), col("id_b"),
          round(dot_product(col("va"), col("vb")) / (col("na") * col("nb")), 4).as("sim"))
        .filter(col("sim") > 0.8)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val got = VectorOps.embedNearDupLsh(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val missing = (want.keySet -- got.keySet).toSeq.sorted.map(p => s"$p sim=${want(p)}")
      val extra = (got.keySet -- want.keySet).toSeq.sorted.map(p => s"$p sim=${got(p)}")
      assert(missing.isEmpty && extra.isEmpty,
        s"q48@$dir recall/soundness break — missing=${missing.mkString("[", "; ", "]")} " +
          s"extra=${extra.mkString("[", "; ", "]")}")
      // values must agree too (same rounding discipline both sides)
      got.foreach { case (p, s0) => assert(s0 == want(p), s"q48@$dir sim drift at $p") }
    }
  }

  test("randomized corpora: pipeline equals brute force (not fixture-contingent)") {
    // Seeded generative check: the equality must hold on corpora the
    // fixtures never showed — planted exact dups, near-dups at and
    // around the threshold, short/empty docs, shared-vocab noise.
    import spark.implicits._
    val rnd = new scala.util.Random(4242)
    val vocab = (0 until 120).map(i => s"v$i")
    def randDoc(n: Int): String =
      (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    (0 until 3).foreach { trial =>
      val bases = (0 until 40).map(i => (i.toLong, randDoc(12 + rnd.nextInt(40))))
      val mutated = bases.take(12).map { case (id, tx) =>
        val w = tx.split(' ')
        val k = 1 + rnd.nextInt(3) // 1-3 word edits: straddles j=0.8
        val out = w.indices.foldLeft(w) { (acc, _) => acc }.clone()
        (0 until k).foreach(_ => out(rnd.nextInt(out.length)) = vocab(rnd.nextInt(vocab.size)))
        (id + 100L, out.mkString(" "))
      }
      val exactDups = bases.take(6).map { case (id, tx) => (id + 200L, tx) }
      val degenerate = Seq((300L, ""), (301L, "one"), (302L, "one two"))
      val d = java.nio.file.Files.createTempDirectory(s"randgate$trial").toString
      (bases ++ mutated ++ exactDups ++ degenerate)
        .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      val want = pairStats(NearDupOps.exactNearDupBrute(spark, d, 0.8))
      val got = pairStats(NearDupOps.minhashNearDup(spark, d))
      diff(s"q43@trial$trial", got, want)
      val want9 = pairStats(NearDupOps.exactNearDupBrute(spark, d, 0.9))
      val got9 = pairStats(NearDupOps.docEmbedNearDup(spark, d))
      diff(s"q49@trial$trial", got9, want9)
    }
  }

  test("no post-collapse saturated band exists on the shipped fixtures") {
    // inside a saturated band the candidate stage is the 8-hub star, so
    // pair-level completeness there is contingent — this pins that the
    // shipped fixtures never enter that regime (the soak watches larger
    // corpora)
    dirs.foreach { dir =>
      val sat = NearDupOps.saturatedBands(spark, dir).collect()
      assert(sat.isEmpty,
        s"saturated distinct-text bands at $dir: ${sat.mkString(", ")}")
    }
  }
}
