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

  // ---- q199 removal (r16 verdict item 2) --------------------------------

  private def removeMap(rows: Seq[(Long, String)], k: Int):
      Map[Long, (Long, Long, Long, String)] =
    graft.llm.TextOps.dupSpanRemove(rows.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("q199 removal: first occurrence survives, repeats are cut, " +
      "within-doc repeats keep one copy, overlapping cut runs union") {
    val s1 = toks(8, "s1x")
    val cTokens = s1 ++ toks(5, "s2x") // windows 0 (=s1) and 5 dup'd below
    val s2 = cTokens.slice(5, 13)
    val rep = "r0"
    val got = removeMap(Seq(
      1L -> s1.mkString(" "),               // owns the s1 first occurrence
      2L -> s2.mkString(" "),               // owns the s2 first occurrence
      3L -> cTokens.mkString(" "),          // both windows are repeats
      4L -> Seq.fill(20)(rep).mkString(" "), // within-doc repeat
      5L -> toks(30, "u").mkString(" ")), k = 8)
    // first occurrences are untouched, token-for-token
    assert(got(1L) == ((8L, 0L, 0L, s1.mkString(" "))))
    assert(got(2L) == ((8L, 0L, 0L, s2.mkString(" "))))
    // C's two cut windows (positions 0 and 5 -> two runs) cover the
    // union [0,12] = every token: the whole doc is cut
    assert(got(3L) == ((13L, 2L, 13L, "")))
    // within-doc repeat: windows 1..12 are non-first -> one run [1,12]
    // covering tokens 1..19; exactly ONE copy of the span survives
    assert(got(4L) == ((20L, 1L, 19L, rep)))
    // the clean doc round-trips (whitespace-normalized contract)
    assert(got(5L) == ((30L, 0L, 0L, toks(30, "u").mkString(" "))))
  }

  test("q199 removal is parameterized by gram width (two widths on the " +
      "same corpus) and coverage beats protection on overlap") {
    val corpus = Seq(
      1L -> "a b c z",          // abc first occurrence
      2L -> "a b c d",          // abc repeat at 0; bcd globally unique
      3L -> "p q r p q r p q r" // 3-token span repeated 3x within doc
    )
    val k3 = removeMap(corpus, k = 3)
    // doc 2: the cut window [0,2] overlaps the PROTECTED unique window
    // bcd@[1,3] — coverage wins, tokens 0-2 go, only "d" survives
    assert(k3(1L) == ((4L, 0L, 0L, "a b c z")))
    assert(k3(2L) == ((4L, 1L, 3L, "d")))
    // doc 3: cut windows {3,4,5,6} merge to one run covering 3..8 —
    // one copy of the repeated span survives
    assert(k3(3L) == ((9L, 1L, 6L, "p q r")))
    // at k = 8 no doc has a duplicated 8-gram: everything survives
    val k8 = removeMap(corpus, k = 8)
    assert(k8(2L) == ((4L, 0L, 0L, "a b c d")))
    assert(k8(3L) == ((9L, 0L, 0L, "p q r p q r p q r")))
  }

  // ---- q200 staged incremental (r16 verdict item 8) ----------------------

  private def reportOf(df: org.apache.spark.sql.DataFrame):
      Seq[Seq[Any]] = df.collect().map(_.toSeq.toSeq).toSeq

  private def docsFrame(rows: Seq[(Long, String, String)]) =
    rows.map { case (id, tx, src) => (id, tx, src) }
      .toDF("doc_id", "text", "source")

  test("q200 staged incremental equals the fresh full-corpus report, " +
      "including the unique->duplicated FLIP of corpus positions") {
    val k = 3
    val span = "f0 f1 f2" // appears ONCE in base doc 1; batch re-delivers it
    val base = docsFrame(Seq(
      // doc 1: the flip target — span once, plus filler; no base dup
      (1L, s"$span a0 a1 a2 a3", "web"),
      // docs 2/3: an EXISTING base dup pair (their runs are staged)
      (2L, "d0 d1 d2 d3 x0 x1", "web"),
      (3L, "d0 d1 d2 d3 y0 y1", "wiki"),
      // doc 4: untouched clean doc
      (4L, "u0 u1 u2 u3 u4", "wiki")))
    val batch = docsFrame(Seq(
      // re-delivers doc 1's span AND doc 2's tail gram "d3 x0 x1" ->
      // doc 1 flips from clean, doc 2 (which already has a STAGED run)
      // gains a flipped position — the union-rebuild path
      (17L, s"$span d3 x0 x1", "web"),
      // within-batch duplication, unknown to the corpus
      (27L, "n0 n1 n2 m0 n0 n1 n2", "wiki")))
    val (dgn, runs, totals) = graft.llm.SpanDigestIndex.frames(base, k)
    val staged = reportOf(graft.llm.TextOps.dupSpansAgainst(
      dgn, runs, totals, batch, k))
    val fresh = reportOf(graft.llm.TextOps.dupSpansOf(
      base.unionByName(batch), k))
    assert(staged == fresh, s"staged=$staged fresh=$fresh")
    // non-vacuous: the flip actually happened — doc 1's source row
    // carries dup tokens from a span that was NOT duplicated in base
    val baseOnly = reportOf(graft.llm.TextOps.dupSpansOf(base, k)).toSeq
    val webBase = baseOnly.find(_.head == "web").get
    val webNow = staged.find(_.head == "web").get
    assert(webNow(4).asInstanceOf[Long] > webBase(4).asInstanceOf[Long],
      "the batch must flip base positions into duplication")
  }

  test("q200 re-delivery idempotence: a batch doc already present in " +
      "the index is excluded, so its unique grams cannot spuriously " +
      "flip to duplicated") {
    val k = 3
    val base = docsFrame(Seq(
      (1L, "q0 q1 q2 q3 q4", "web"),
      (2L, "d0 d1 d2 z0", "web"),
      (3L, "d0 d1 d2 w0", "wiki")))
    val (dgn, runs, totals) = graft.llm.SpanDigestIndex.frames(base, k)
    // batch re-delivers doc 1 byte-identical PLUS one genuinely new doc
    val redelivery = docsFrame(Seq(
      (1L, "q0 q1 q2 q3 q4", "web"),
      (9L, "v0 v1 v2 v3", "wiki")))
    val cleanBatch = docsFrame(Seq((9L, "v0 v1 v2 v3", "wiki")))
    val withRedelivery = reportOf(graft.llm.TextOps.dupSpansAgainst(
      dgn, runs, totals, redelivery, k))
    val withoutIt = reportOf(graft.llm.TextOps.dupSpansAgainst(
      dgn, runs, totals, cleanBatch, k))
    assert(withRedelivery == withoutIt,
      "re-delivered doc must not double-count its grams")
    // and the answer is the fresh run over base ∪ {the new doc}
    assert(withRedelivery == reportOf(graft.llm.TextOps.dupSpansOf(
      base.unionByName(cleanBatch), k)))
  }

  test("q199 removal: null text cleans to the empty vector") {
    val rows = Seq((1L, null.asInstanceOf[String]), (2L, "x y z"))
    val got = graft.llm.TextOps.dupSpanRemove(rows.toDF("doc_id", "text"), 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    assert(got(1L) == ((0L, 0L, 0L, "")))
    assert(got(2L) == ((3L, 0L, 0L, "x y z")))
  }

  // ---- q201 span decontamination (round 17) -----------------------------

  private def deconMap(train: Seq[(Long, String)],
      evalDocs: Seq[(Long, String)], k: Int):
      Map[Long, (Long, Long, Long, String)] =
    graft.llm.TextOps.decontaminateSpans(
      train.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), k)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))))
      .toMap

  test("q201 decontamination: every training occurrence of an eval gram " +
      "is cut (no first-occurrence protection), train-internal " +
      "duplicates survive untouched") {
    val e1 = toks(8, "e1x") // the benchmark item: one 8-gram
    val got = deconMap(Seq(
      // quoted mid-doc: run [3,10] cut, surroundings survive
      1L -> (toks(3, "a") ++ e1 ++ toks(3, "b")).mkString(" "),
      // the doc IS the benchmark item — fully cut (q199 would have
      // protected a first occurrence; decontamination protects none)
      2L -> e1.mkString(" "),
      // a WITHIN-TRAIN duplicated 8-gram: q201 is not dedup — kept
      3L -> (toks(8, "d") ++ toks(8, "d")).mkString(" "),
      4L -> toks(10, "c").mkString(" ")),
      Seq(100L -> e1.mkString(" ")), k = 8)
    assert(got(1L) == ((14L, 1L, 8L,
      (toks(3, "a") ++ toks(3, "b")).mkString(" "))))
    assert(got(2L) == ((8L, 1L, 8L, "")))
    assert(got(3L) == ((16L, 0L, 0L,
      (toks(8, "d") ++ toks(8, "d")).mkString(" "))))
    assert(got(4L) == ((10L, 0L, 0L, toks(10, "c").mkString(" "))))
  }

  test("q202 bloom-prefiltered decontamination equals the broadcast " +
      "form exactly (false positives filtered by the exact verify)") {
    val e1 = toks(8, "e1x")
    val train = Seq(
      1L -> (toks(3, "a") ++ e1 ++ toks(3, "b")).mkString(" "),
      2L -> e1.mkString(" "),
      3L -> (toks(8, "d") ++ toks(8, "d")).mkString(" "),
      4L -> toks(10, "c").mkString(" "))
    val evalDocs = Seq(100L -> e1.mkString(" "))
    val exact = graft.llm.TextOps.decontaminateSpans(
      train.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), 8)
      .collect().map(_.toSeq).toSeq
    val bloom = graft.llm.TextOps.bloomDecontaminateSpans(
      train.toDF("doc_id", "text"), evalDocs.toDF("doc_id", "text"), 8)
      .collect().map(_.toSeq).toSeq
    assert(bloom == exact)
    // non-vacuous: the corpus actually has cut AND kept docs
    assert(exact.exists(_(3).asInstanceOf[Long] > 0L))
    assert(exact.exists(_(3).asInstanceOf[Long] == 0L))
  }

  test("q201 decontamination: overlapping contaminated windows union " +
      "into one cut run; null text cleans to the empty vector") {
    // eval doc of 9 tokens -> two overlapping 8-grams; a train doc
    // containing all 9 tokens has cut windows {0,1} -> ONE run [0,8]
    val e = toks(9, "e")
    val got = deconMap(Seq(
      1L -> (e ++ toks(2, "t")).mkString(" "),
      2L -> null.asInstanceOf[String]),
      Seq(100L -> e.mkString(" ")), k = 8)
    assert(got(1L) == ((11L, 1L, 9L, toks(2, "t").mkString(" "))))
    assert(got(2L) == ((0L, 0L, 0L, "")))
  }
}
