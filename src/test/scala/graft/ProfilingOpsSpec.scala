package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{TextOps, VectorOps}

/** Value-level checks for the corpus-profiling / compression operators
  * (q70–q74) on controlled fixtures — the DuckDB oracle pins them on
  * the driver tables; these pin the semantics on inputs with known
  * answers. */
class ProfilingOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("profiling").toString
    rows.map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition kernel counts tokens, distinct tokens and the top bigram") {
    val d = docsDir(Seq(
      (0L, "a a a a a"), // degenerate: 1 distinct token, "a a" appears 4×
      (1L, (1 to 20).map(i => s"tok$i").mkString(" ")), // all unique
      (2L, "x"), // 1 token: no repetition signal, excluded
      (3L, "spam ham spam ham spam ham spam ham spam ham"))) // period-2 loop
    val r = TextOps.repetitionScore(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(2L), "single-token doc carries no repetition signal")
    val deg = r(0L)
    assert(deg.getLong(1) == 5 && deg.getLong(2) == 1 && deg.getLong(3) == 4)
    assert(deg.getDouble(4) == 1.0 / 5) // distinct_ratio
    assert(deg.getDouble(5) == 1.0)     // top_bigram_frac: 4 of 4 bigrams
    assert(deg.getBoolean(6), "degenerate doc must be flagged")
    val uniq = r(1L)
    assert(uniq.getLong(2) == 20 && uniq.getLong(3) == 1)
    assert(!uniq.getBoolean(6), "all-unique doc must not be flagged")
    val loop = r(3L)
    // "spam ham" occurs 5×, "ham spam" 4× → top is 5 of 9 bigrams
    assert(loop.getLong(3) == 5)
    assert(loop.getDouble(5) == 5.0 / 9)
    assert(loop.getBoolean(6), "period-2 loop must be flagged")
  }

  test("containment detects a small doc embedded in a larger one") {
    val small = "alpha beta gamma delta epsilon"
    val big = "prefix words here " + small + " and a long suffix continues on"
    val d = docsDir(Seq((0L, small), (1L, big),
      (2L, "completely unrelated content entirely different words")))
    val rows = TextOps.ngramContainment(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getDouble(3), r.getDouble(4))))
      .toMap
    // every 3-gram of the small doc appears in the big one
    assert(rows((0L, 1L))._1 == 1.0, "small doc fully contained in big")
    assert(rows((0L, 1L))._2 < 0.5, "big doc is NOT contained in small")
    assert(!rows.contains((0L, 2L)), "unrelated docs share no 3-gram")
  }

  test("int8 quantization stats: exact scale, bounded reconstruction error") {
    val d = java.nio.file.Files.createTempDirectory("quant").toString
    Seq(
      (0L, Seq(127.0f, -127.0f, 63.5f), 0),
      (1L, Seq(0.0f, 0.0f, 0.0f), 0), // zero vector: no scale, excluded
      (2L, Seq(1.0f, -0.5f, 0.25f, 0.125f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val r = VectorOps.int8Quantize(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(1L), "zero vector has no quantization scale")
    val v0 = r(0L)
    assert(v0.getDouble(1) == 1.0) // scale = 127/127
    // errors: (0, 0, -0.5) → mse = 0.25/3, max_err = 0.5
    assert(v0.getDouble(2) == 0.25 / 3)
    assert(v0.getDouble(3) == 0.5)
    // generic bound: |err| <= scale/2 + ulp for every vector
    r.values.foreach { row =>
      assert(row.getDouble(3) <= row.getDouble(1) / 2 + 1e-12,
        s"max_err must be bounded by scale/2: $row")
    }
    // and on the real corpus the bound holds for every vector
    val all = VectorOps.int8Quantize(spark, sfDir).collect()
    assert(all.nonEmpty)
    all.foreach { row =>
      assert(row.getDouble(3) <= row.getDouble(1) / 2 + 1e-12)
    }
  }

  test("normalization lowercases, strips punctuation, collapses whitespace") {
    val d = docsDir(Seq(
      (0L, "Hello, World!  Mixed-CASE text."),
      (1L, "already normalized lowercase text")))
    val r = TextOps.normalizeText(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getString(2), x.getBoolean(4)))).toMap
    assert(r(0L)._1 == "hello world mixed case text")
    assert(r(0L)._2, "rewritten text must be flagged changed")
    assert(r(1L)._1 == "already normalized lowercase text")
    assert(!r(1L)._2, "already-normal text is not changed")
  }

  test("chunk windows cover every token with the declared overlap") {
    val d = docsDir(Seq(
      (0L, (1 to 100).map(i => s"t$i").mkString(" ")), // 3 chunks
      (1L, "short doc five tokens only"),              // 1 chunk
      (2L, "")))                                       // degenerate: 1 empty chunk
    val rows = TextOps.chunkWindows(spark, d).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    val c0 = byDoc(0L).sortBy(_.getLong(1))
    assert(c0.length == 3) // ceil((100-10)/30)
    assert(c0.map(_.getLong(3)).toSeq == Seq(40L, 40L, 40L))
    // stride 30 / width 40: chunk i starts at token 30i+1 → chunks are
    // (1..40), (31..70), (61..100) — every token covered, 10 overlap
    val covered = c0.flatMap(_.getString(4).split(" ")).toSet
    assert(covered == (1 to 100).map(i => s"t$i").toSet)
    assert(c0(0).getString(4).endsWith("t40") && c0(1).getString(4).startsWith("t31"))
    assert(byDoc(1L).length == 1 && byDoc(1L).head.getLong(3) == 5)
    assert(byDoc(2L).length == 1 && byDoc(2L).head.getString(4) == "")
  }

  test("source profile partitions the corpus exactly") {
    val prof = TextOps.sourceProfile(spark, sfDir).collect()
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(prof.map(_.getLong(1)).sum == total,
      "per-source doc counts must partition the corpus")
    prof.foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0) // short_frac
      assert(r.getLong(4) >= 1) // n_langs
    }
  }

  test("per-row operators plan without a data shuffle (scan -> kernel -> sort)") {
    // Scale guard: q70/q74/q77 are pure per-row transforms — the only
    // exchange in their plans must be the final ORDER BY's range
    // partitioning (a harness requirement, not operator cost). A hash
    // exchange appearing here would mean a future edit introduced a
    // shuffle into a scan-speed operator.
    Seq(
      TextOps.repetitionScore(spark, sfDir),
      VectorOps.int8Quantize(spark, sfDir),
      TextOps.normalizeText(spark, sfDir)
    ).foreach { df =>
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"per-row operator must not hash-shuffle:\n$plan")
    }
  }

  test("length histogram buckets partition the corpus; shares sum to 1") {
    val h = TextOps.lengthHistogram(spark, sfDir).collect()
    val total = Tables.t(spark, sfDir, "documents").count()
    assert(h.map(_.getLong(1)).sum == total)
    assert(math.abs(h.map(_.getDouble(2)).sum - 1.0) < 1e-9)
    h.foreach(r => assert(r.getLong(0) % 25 == 0))
  }
}
