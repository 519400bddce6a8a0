package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Value-level checks for q198 duplicated-span mining (Lee et al. '21
  * — r15 verdict item 5): the DuckDB oracle pins the fixture corpus;
  * these fixtures pin the semantics a hash can't explain — within-doc
  * repeats count as duplication, runs merge into maximal spans, and
  * OVERLAPPING token intervals (run gap < k) union-merge so dup_tokens
  * never double-counts a token. */
class DupSpansSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("dupspans").toString
    rows.map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  private def toks(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"$tag$i")

  test("cross-doc span, within-doc repeat, overlap merge, clean doc") {
    // S1 = 8 tokens shared by A and C; S2 = 8 tokens shared by B and C,
    // laid out in C so the two runs' TOKEN intervals overlap (run at
    // pos 0 covers tokens 0-7, run at pos 5 covers 5-12 -> union 13).
    val s1 = toks(8, "s1x")
    val s2 = s1.drop(5) ++ toks(5, "s2x") // C = s1 ++ s2.drop(3)? build C directly
    val cTokens = s1 ++ toks(5, "s2x")    // 13 tokens: windows 0 (=s1) and 5 (=s2)
    assert(cTokens.slice(5, 13) == s2)
    val rep = toks(1, "r").head           // within-doc repeat: "r0" x 20
    val d = docsDir(Seq(
      (1L, s1.mkString(" "), "a"),                 // window 0 dup (in C)
      (2L, s2.mkString(" "), "b"),                 // window 0 dup (in C)
      (3L, cTokens.mkString(" "), "c"),            // runs {0} and {5} -> merge
      (4L, Seq.fill(20)(rep).mkString(" "), "d"),  // all 13 windows dup (self)
      (5L, toks(30, "u").mkString(" "), "e")))     // no dup anywhere
    val got = graft.llm.TextOps.dupSpans(spark, d)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(got("a") == ((1L, 1L, 1L, 8L, 8L)), s"a: ${got("a")}")
    assert(got("b") == ((1L, 1L, 1L, 8L, 8L)), s"b: ${got("b")}")
    // C: two spans (runs at 0 and 5 are not position-consecutive),
    // token union 0-12 = 13 tokens of 13 total
    assert(got("c") == ((1L, 1L, 2L, 13L, 13L)), s"c: ${got("c")}")
    // within-doc repeat: every window duplicated -> one run covering
    // all 20 tokens
    assert(got("d") == ((1L, 1L, 1L, 20L, 20L)), s"d: ${got("d")}")
    assert(got("e") == ((1L, 0L, 0L, 0L, 30L)), s"e: ${got("e")}")
  }
}
