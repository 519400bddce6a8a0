package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.QualityOps

/** Value-level checks for the round-4 quality operators (q101–q103) on
  * controlled fixtures; the DuckDB oracle pins them on driver tables. */
class QualityOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("quality").toString
    rows.map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def words(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("window dedup: repeated 20-token spans are flagged, earliest occurrence is canonical") {
    val span = words("w", 20) // one exact 20-token window
    val d = docsDir(Seq(
      (0L, span + " " + words("x", 20), "s"), // 2 windows, both first occurrences
      (1L, span + " " + words("y", 20), "s"), // window 0 duplicates doc0's
      (2L, words("z", 25), "s"),              // 2 windows (20 + 5-token tail), unique
      (3L, span + " " + words("x", 20), "s"), // exact copy of doc0 → both dup
      (4L, words("v", 5), "s")))              // single short window, unique
    val r = QualityOps.windowDedup(spark, d).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getBoolean(4)))).toMap
    assert(r(0L) == ((2L, 0L, false)), "doc0 owns both its windows")
    assert(r(1L) == ((2L, 1L, false)), "doc1 repeats only the shared span")
    assert(r(2L) == ((2L, 0L, false)), "unique doc has no dup windows")
    assert(r(3L) == ((2L, 2L, true)), "verbatim copy is fully duplicated")
    assert(r(4L) == ((1L, 0L, false)), "short doc still yields its tail window")
  }

  test("gopher quality gate: each rule flips independently") {
    val stopPad = "the a " // 2 stopwords
    val d = docsDir(Seq(
      // 32 words, mean len in range, stopwords present → keep
      (0L, stopPad + words("abc", 30), "s"),
      // too short (12 words) but stopwords present
      (1L, stopPad + words("abc", 10), "s"),
      // word count and mean length ok, no stopwords
      (2L, words("abc", 35), "s"),
      // mean word length too long (10-char words)
      (3L, stopPad + words("abcdefghi", 30), "s")))
    val r = QualityOps.gopherQuality(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getAs[Boolean]("keep"))
    assert(!r(1L).getAs[Boolean]("flag_word_count") && !r(1L).getAs[Boolean]("keep"))
    assert(!r(2L).getAs[Boolean]("flag_stop") && !r(2L).getAs[Boolean]("keep"))
    assert(!r(3L).getAs[Boolean]("flag_mean_wlen") && !r(3L).getAs[Boolean]("keep"))
    // exact arithmetic: doc0 = "the"(3) + "a"(1) + abc0..abc9 (4 chars
    // each) + abc10..abc29 (5 chars each) → 144 chars over 32 words
    val d0 = r(0L)
    assert(d0.getAs[Long]("n_words") == 32 && d0.getAs[Long]("n_stop") == 2)
    assert(d0.getAs[Double]("mean_word_len") == 4.5)
  }

  test("weighted reservoir matches an independent recompute of the ES keys") {
    val docs = Tables.t(spark, sfDir, "documents")
      .select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val expected = docs.filter(_._3 > 0)
      .map { case (id, src, nc) =>
        val h = (id * 2654435761L + 40503L) % 4294967296L
        val key = math.rint(math.log((h + 1).toDouble / 4294967296.0) / nc * 1e6) / 1e6
        (src, key, id, nc)
      }
      .groupBy(_._1).toSeq.flatMap { case (src, xs) =>
        xs.sortBy(x => (-x._2, x._3)).take(10).zipWithIndex
          .map { case ((_, key, id, nc), i) => (src, i + 1L, id, nc, key) }
      }.toSet
    val got = QualityOps.weightedReservoir(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    assert(got == expected, "per-source ES top-10 must match the recompute")
    // deterministic across runs
    val again = QualityOps.weightedReservoir(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(again == got.map(x => (x._1, x._2, x._3)))
  }
}
