package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.SamplingOps

/** Mixture sampling + shard packing: the properties that matter for a
  * training-data pipeline are determinism and per-doc stability (a doc's
  * fate never depends on the rest of the corpus). */
class SamplingSpec extends AnyFunSuite {
  import TestSpark._

  test("hash sample: per-stratum rates hit their targets") {
    val total = Tables.t(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SamplingOps.hashSample(spark, sfDir)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = SamplingOps.mixtureRates.toMap.map { case (l, hex) =>
      l -> java.lang.Long.parseLong(hex, 16).toDouble / (1L << 32) }
    want.foreach { case (lang, rate) =>
      val n = total.getOrElse(lang, 0L)
      if (n > 20) {
        val got = kept.getOrElse(lang, 0L).toDouble / n
        // md5 buckets are uniform; binomial 4-sigma tolerance
        val tol = 4 * math.sqrt(rate * (1 - rate) / n)
        assert(math.abs(got - rate) <= tol + 1e-9,
          s"$lang: got $got want $rate ± $tol (n=$n)")
      }
    }
  }

  test("hash sample: a doc's fate is independent of the rest of the corpus") {
    val full = SamplingOps.hashSample(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // re-sample a corpus slice written separately: same decisions
    val d = java.nio.file.Files.createTempDirectory("sampSub").toString
    Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 100)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val slice = SamplingOps.hashSample(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(slice == full.filter(_ < 100))
  }

  test("shard pack: budget respected, ids contiguous from zero") {
    val rows = SamplingOps.shardPack(spark, sfDir, budget = 2000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // shard ids start at 0 and never skip
    val ids = rows.map(_._4)
    assert(ids.head == 0L)
    assert(ids.sliding(2).forall { case Array(a, b) => b == a || b == a + 1; case _ => true })
    // every shard's token mass stays under budget + one max-doc overflow
    val maxDoc = rows.map(_._2).max
    rows.groupBy(_._4).values.foreach { shard =>
      assert(shard.map(_._2).sum <= 2000L + maxDoc)
    }
    // tokens conserved
    assert(rows.map(_._2).sum == rows.last._3)
  }

  test("weighted sample: docs at full weight always kept, keep rate tracks length") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = SamplingOps.weightedSample(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // p = min(1, n/400): every long doc must be kept
    val long = docs.filter(_._2 >= 400).keySet
    assert(long.subsetOf(kept), "n_chars >= 400 means p = 1, never dropped")
    // aggregate keep rate among short docs ≈ mean(n/400), binomial 4σ
    val short = docs.filter(_._2 < 400)
    if (short.size > 30) {
      val expect = short.values.map(_.toDouble / 400).sum / short.size
      val got = short.keySet.count(kept).toDouble / short.size
      val tol = 4 * math.sqrt(expect * (1 - expect) / short.size)
      assert(math.abs(got - expect) <= tol,
        s"keep rate $got vs expected $expect ± $tol")
    }
  }

  test("weighted sample: decision is per-doc stable under corpus slicing") {
    val full = SamplingOps.weightedSample(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val d = java.nio.file.Files.createTempDirectory("wsampSub").toString
    Tables.t(spark, sfDir, "documents").filter(col("doc_id") < 100)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val slice = SamplingOps.weightedSample(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(slice == full.filter(_ < 100))
  }

  test("token budget: targets respect the cap, track sqrt supply, never up-sample") {
    val rows = SamplingOps.tokenBudget(spark, sfDir).collect()
    val budget = 500000L
    assert(rows.nonEmpty)
    // Σ floor(B·wᵢ) ≤ B because Σwᵢ = 1 exactly before rounding
    assert(rows.map(_.getLong(3)).sum <= budget)
    assert(math.abs(rows.map(_.getDouble(2)).sum - 1.0) < 1e-3,
      "weights sum to 1 (up to per-row rounding)")
    rows.foreach { r =>
      val (avail, target) = (r.getLong(1), r.getLong(3))
      assert(r.getDouble(4) <= 1.0, "keep rate is capped")
      assert(math.abs(r.getDouble(5) - target.toDouble / avail) < 1e-3,
        "epochs = target/avail")
    }
    // temperature shape: weights order like sqrt(avail) — any two rows
    val s = rows.sortBy(_.getLong(1))
    s.sliding(2).foreach {
      case Array(lo, hi) =>
        assert(lo.getDouble(2) <= hi.getDouble(2) + 1e-9,
          "weight is monotone in token supply")
      case _ =>
    }
  }

  test("effective budget counts dup clusters once and reweights accordingly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("effbud").toString
    val ten = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val five = "uno dos tres cuatro cinco"
    val four = "eins zwei drei vier"
    // s1: dup pair (10 tokens, counted once) + 5-token unique → eff 15;
    // s2: a 4-token singleton → eff 4. Raw supply would be 25 vs 4.
    Seq((0L, ten, "s1"), (1L, ten, "s1"), (2L, five, "s1"), (3L, four, "s2"))
      .map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = SamplingOps.effectiveBudget(spark, d).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getDouble(2)))).toMap
    assert(r("s1")._1 == 15L && r("s2")._1 == 4L)
    val z = math.sqrt(15) + math.sqrt(4)
    assert(math.abs(r("s1")._2 - math.sqrt(15) / z) < 1e-5,
      "weight follows the deduped sqrt supply")
  }

  test("split assign: exhaustive, disjoint, 90/5/5 within tolerance, stable") {
    val total = Tables.t(spark, sfDir, "documents").count()
    val rows = SamplingOps.splitAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(4))
    assert(rows.length == total, "every doc gets exactly one split")
    assert(rows.map(_._1).distinct.length == rows.length)
    val byName = rows.groupBy(_._2).view.mapValues(_.length.toDouble / total).toMap
    for ((name, want) <- Seq("train" -> 0.9, "val" -> 0.05, "test" -> 0.05)) {
      val got = byName.getOrElse(name, 0.0)
      val tol = 4 * math.sqrt(want * (1 - want) / total)
      assert(math.abs(got - want) <= tol, s"$name: got $got want $want ± $tol")
    }
    // holdout membership never moves when the corpus is sliced
    val d = java.nio.file.Files.createTempDirectory("splitSub").toString
    Tables.t(spark, sfDir, "documents").filter(col("doc_id") % 2 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val sliced = SamplingOps.splitAssign(spark, d).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val fullMap = rows.toMap
    sliced.foreach { case (id, sp) => assert(fullMap(id) == sp) }
  }

  test("cluster-aware splits never separate a near-dup pair; singletons keep q97's split") {
    val splits = SamplingOps.clusterSplitAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(4)))).toMap
    // every verified near-dup pair (exact Jaccard ≥ 0.8, the q43
    // contract) lands in ONE split — the leakage q126 measures is
    // structurally impossible here
    val pairs = graft.llm.NearDupOps.minhashNearDup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must contain near-dup pairs")
    pairs.foreach { case (a, b) =>
      assert(splits(a)._2 == splits(b)._2, s"pair ($a,$b) straddles splits")
    }
    // docs outside any cluster carry their own id and the q97 salt, so
    // their split is exactly q97's — adopting q172 only moves clusters
    val q97 = SamplingOps.splitAssign(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    val singletons = splits.filter { case (id, (cid, _)) => cid == id }
    assert(singletons.nonEmpty)
    // (cluster representatives also salt their own id — equality holds
    // for them too, which is fine: only NON-canonical members move)
    singletons.foreach { case (id, (_, sp)) => assert(q97(id) == sp) }
  }

  test("holdout balance: per-source shares sum to 1, deviation = share − global") {
    val rows = SamplingOps.holdoutBalance(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).values.foreach { rs =>
      val s = rs.map(_.getDouble(4)).sum
      assert(math.abs(s - 1.0) < 1e-4, s"src shares sum to 1 within 6dp rounding, got $s")
    }
    rows.foreach { r =>
      assert(math.abs(r.getDouble(6) - (r.getDouble(4) - r.getDouble(5))) < 1e-9,
        "deviation must be exactly src_share - global_share")
      assert(r.getLong(2) > 0 && r.getLong(3) >= 0)
    }
    // cells agree with a direct count over the q172 assignment
    val direct = SamplingOps.clusterSplitAssign(spark, sfDir)
      .groupBy("source", "split").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    rows.foreach { r =>
      assert(direct((r.getString(0), r.getString(1))) == r.getLong(2))
    }
  }

  test("sequence chunks tile the token stream exactly: full examples, no gaps") {
    import org.apache.spark.sql.functions._
    val c = 512L
    val rows = SamplingOps.sequenceChunks(spark, sfDir, c).collect()
    assert(rows.nonEmpty)
    // Per-example token sums: every example is exactly C tokens except
    // possibly the last (the stream remainder).
    val perExample = rows.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(4)).sum).toMap
    val lastEx = perExample.keys.max
    perExample.foreach { case (ex, n) =>
      if (ex < lastEx) assert(n == c, s"example $ex has $n tokens, want $c")
      else assert(n > 0 && n <= c, s"last example has $n tokens")
    }
    // Examples are contiguous from 0, and within each example the doc
    // spans tile [ex*C, ex*C + sum) without gaps or overlaps.
    assert(perExample.keys.min == 0L)
    assert(perExample.size == lastEx + 1)
    rows.groupBy(_.getLong(0)).foreach { case (ex, rs) =>
      val spans = rs.map(r => (r.getLong(2), r.getLong(3))).sortBy(_._1)
      assert(spans.head._1 == ex * c)
      spans.sliding(2).foreach { w =>
        if (w.length == 2)
          assert(w(0)._2 == w(1)._1, s"gap in example $ex")
      }
    }
    // Total spans reconstruct every doc's full token count.
    val perDoc = rows.groupBy(_.getLong(1)).view
      .mapValues(_.map(_.getLong(4)).sum).toMap
    val want = SamplingOps.sequenceChunks(spark, sfDir, c)
      .sparkSession.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("n"))
      .filter(col("n") > 0).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perDoc == want, "doc spans must reconstruct every doc exactly")
  }

  test("q195 composes the fuzzy stage NON-vacuously: its survivor set " +
      "is a strict subset of q193's (same chain minus fuzzy dedup)") {
    val q193Ids = SamplingOps.paragraphCuration(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val q195Ids = SamplingOps.fullCuration(spark, sfDir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(q195Ids.subsetOf(q193Ids),
      "the fuzzy stage must only REMOVE docs from the q193 chain")
    assert(q195Ids.size < q193Ids.size,
      "fixture must exercise the fuzzy stage (no doc was fuzzy-dropped)")
  }
}
