package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.CorpusOps

/** Value-level checks for the round-3 corpus-curation operators
  * (q79–q83) on controlled fixtures with hand-computable answers; the
  * DuckDB oracle pins them on the driver tables. */
class CorpusOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("corpus").toString
    rows.map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("char entropy: degenerate, two-symbol and uniform distributions") {
    val d = docsDir(Seq(
      (0L, "aaaaaa", "s"),          // one symbol → entropy 0 (and +0.0, not -0.0)
      (1L, "abab", "s"),            // two equiprobable symbols → ln 2
      (2L, "abcdefgh", "s"),        // eight equiprobable → ln 8
      (3L, "aab", "s")))            // (2/3)ln(3/2) + (1/3)ln 3
    val r = CorpusOps.charEntropy(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(0L).getDouble(3) == 0.0)
    assert(java.lang.Double.doubleToRawLongBits(r(0L).getDouble(3)) == 0L,
      "entropy of a constant string must be +0.0, not -0.0")
    assert(r(0L).getBoolean(4), "constant string is low-entropy")
    assert(r(1L).getDouble(3) == math.rint(math.log(2) * 1e4) / 1e4)
    assert(r(2L).getDouble(3) == math.rint(math.log(8) * 1e4) / 1e4)
    val expected3 = 0.0 - (2.0 / 3 * math.log(2.0 / 3) + 1.0 / 3 * math.log(1.0 / 3))
    assert(math.abs(r(3L).getDouble(3) - expected3) < 1e-4)
    assert(r(2L).getLong(1) == 8 && r(2L).getLong(2) == 8)
    assert(!r(2L).getBoolean(4), "uniform 8-symbol text (ln 8 ≈ 2.08) is not flagged")
  }

  test("common-gram filter flags docs made of corpus-frequent 5-grams") {
    val boiler = "all rights reserved by the site owner today"
    val d = docsDir(Seq(
      (0L, boiler, "s"),
      (1L, boiler, "s"),
      (2L, boiler + " plus unique trailing content here", "s"),
      (3L, "completely original text with distinct phrasing and no shared spans", "s"),
      (4L, "tiny", "s"))) // < 5 tokens → no grams → no row
    val r = CorpusOps.commonGramFilter(spark, d).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r.contains(4L), "sub-5-token doc has no grams")
    // boilerplate appears in docs 0,1,2 → df=3 → common
    assert(r(0L).getBoolean(4) && r(1L).getBoolean(4),
      "pure-boilerplate docs must be flagged")
    assert(r(3L).getLong(2) == 0 && !r(3L).getBoolean(4),
      "original doc shares no grams")
    // doc 2 = 4 boilerplate grams of 9 total (13 tokens → 9 grams,
    // 4 fully inside the boilerplate prefix) → below the 0.5 bar
    assert(r(2L).getLong(1) == 9 && r(2L).getLong(2) == 4)
    assert(!r(2L).getBoolean(4))
  }

  test("tfidf ranks a doc-specific term above corpus-wide terms") {
    val d = docsDir(Seq(
      (0L, "shared shared shared zebra", "s"),
      (1L, "shared shared common words", "s"),
      (2L, "shared common words filler", "s")))
    val rows = CorpusOps.tfidfTerms(spark, d).collect()
    val top0 = rows.filter(r => r.getLong(0) == 0 && r.getLong(1) == 1).head
    // "zebra": tf=1, df=1, N=3 → score ln 3 ≈ 1.0986 beats "shared"
    // (tf=3 but df=3 → idf 0 → score 0)
    assert(top0.getString(2) == "zebra")
    assert(top0.getDouble(5) == math.rint(math.log(3.0) * 1e4) / 1e4)
    val sharedRow = rows.filter(r => r.getLong(0) == 0 && r.getString(2) == "shared")
    assert(sharedRow.forall(_.getDouble(5) == 0.0), "df=N term scores 0")
    // every doc emits at most 3 ranked rows, ranks are 1..k
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(1)).sorted.sameElements(1L to rs.length))
    }
  }

  test("mixture weights follow sqrt(count) and shares stay exact") {
    val docs = (1 to 1).map(i => (i.toLong, s"doc a $i", "small")) ++
      (10 to 13).map(i => (i.toLong, s"doc b $i", "big"))
    val d = docsDir(docs)
    val r = CorpusOps.mixtureWeights(spark, d).collect()
      .map(x => x.getString(0) -> x).toMap
    // counts 1 and 4 → sqrt 1 and 2 → weights 1/3 and 2/3
    assert(r("small").getLong(1) == 1 && r("big").getLong(1) == 4)
    assert(r("small").getDouble(2) == 0.2 && r("big").getDouble(2) == 0.8)
    assert(r("small").getDouble(3) == 0.3333 && r("big").getDouble(3) == 0.6667)
  }

  test("dup rate by source counts exact copies beyond the canonical doc") {
    val d = docsDir(Seq(
      (0L, "identical text body", "dirty"),
      (1L, "identical text body", "dirty"),
      (2L, "identical text body", "dirty"),
      (3L, "unique one", "dirty"),
      (4L, "unique two", "clean"),
      (5L, "unique three", "clean")))
    val r = CorpusOps.dupRateBySource(spark, d).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r("dirty").getLong(1) == 4 && r("dirty").getLong(2) == 2
      && r("dirty").getLong(3) == 2)
    assert(r("dirty").getDouble(4) == 0.5)
    assert(r("clean").getLong(3) == 0 && r("clean").getDouble(4) == 0.0)
  }

  test("length-band dup calibration: dups land in their band, bands are exact") {
    // band 0 (len < 50): 3 docs, one an exact copy → rate 1/3;
    // band 50: 2 distinct docs → rate 0. Bands from floor(n_chars/50).
    val short1 = "tiny text"                              // 9 chars
    val longText = "x" * 60
    val d = docsDir(Seq(
      (0L, short1, "s"), (1L, short1, "s"), (2L, "other small", "s"),
      (3L, longText, "s"), (4L, longText + "y", "s")))
    val r = CorpusOps.lengthDupCalibration(spark, d).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r(0L) == ((3L, 1L, 0.333333)))
    assert(r(50L) == ((2L, 0L, 0.0)))
  }

  test("source datasheet: dup rate, token supplies and weights line up") {
    val ten = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // s1: exact dup pair (10 tokens each) + 4-token unique → raw 24,
    // dedup 14, dup_frac 1/3; s2: one 5-token doc → clean.
    val d = docsDir(Seq(
      (0L, ten, "s1"), (1L, ten, "s1"), (2L, "eins zwei drei vier", "s1"),
      (3L, "uno dos tres cuatro cinco", "s2")))
    val r = CorpusOps.sourceDatasheet(spark, d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getDouble(3), x.getLong(4),
          x.getLong(5), x.getLong(7)))).toMap
    assert(r("s1") == ((3L, 1L, 0.333333, 24L, 14L, 1L)))
    assert(r("s2") == ((1L, 0L, 0.0, 5L, 5L, 1L)))
    // weights follow sqrt(doc counts): sqrt(3)/(sqrt(3)+1) vs 1/(sqrt(3)+1)
    val ws = CorpusOps.sourceDatasheet(spark, d).collect()
      .map(x => x.getString(0) -> x.getDouble(8)).toMap
    val z = math.sqrt(3) + 1
    assert(math.abs(ws("s1") - math.sqrt(3) / z) < 1e-5)
    assert(math.abs(ws("s2") - 1 / z) < 1e-5)
  }

  test("snapshot diff classifies added/removed/changed/unchanged by digest") {
    import spark.implicits._
    val oldSnap = Seq((0L, "same text"), (1L, "old body"), (2L, "gone"))
      .toDF("doc_id", "text")
    val newSnap = Seq((0L, "same text"), (1L, "new body"), (3L, "fresh"))
      .toDF("doc_id", "text")
    val r = CorpusOps.snapshotDiff(oldSnap, newSnap).collect()
      .map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r == Map(0L -> "unchanged", 1L -> "changed",
      2L -> "removed", 3L -> "added"))
    // digests travel, text does not: changed row carries both digests
    val row1 = CorpusOps.snapshotDiff(oldSnap, newSnap).collect()
      .find(_.getLong(0) == 1L).get
    assert(row1.getString(1) != null && row1.getString(2) != null
      && row1.getString(1) != row1.getString(2))
  }

  test("token pair merges count adjacent pairs with deterministic top-k order") {
    val d = docsDir(Seq(
      (0L, "a b a b c", "s"),   // pairs: "a b" x2, "b a", "b c"
      (1L, "a b x", "s"),       // pairs: "a b", "b x"
      (2L, "solo", "s")))       // 1 token → no pairs
    val rows = CorpusOps.tokenPairMerges(spark, d).collect()
    assert(rows.head.getString(0) == "a b"
      && rows.head.getLong(1) == 3 && rows.head.getLong(2) == 2,
      "top merge candidate must be the corpus-most-frequent pair")
    // remaining pairs all have n_occ 1 → tie broken by pair string asc
    assert(rows.map(_.getString(0)).toSeq ==
      Seq("a b", "b a", "b c", "b x"))
    assert(!rows.exists(_.getString(0).contains("solo")),
      "single-token docs contribute no pairs")
  }

  test("LM perplexity: hand-computed add-1 bigram scores on a tiny corpus") {
    // Corpus: "a b", "a b", "a c", "solo" → V = {a,b,c,solo} = 4 (the
    // vocabulary counts every token, including single-token docs that
    // contribute no bigrams); histories c1(a) = 3; c12(a,b) = 2,
    // c12(a,c) = 1.
    //   P(b|a) = (2+1)/(3+4) = 3/7 → doc "a b": nll = -ln(3/7) = 0.8473
    //   P(c|a) = (1+1)/(3+4) = 2/7 → doc "a c": nll = -ln(2/7) = 1.2528
    val d = docsDir(Seq(
      (0L, "a b", "s"), (1L, "a b", "s"), (2L, "a c", "s"),
      (3L, "solo", "s"))) // 1 token → no bigrams → no score row
    val rows = CorpusOps.lmPerplexity(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows == Seq((0L, 1L, 0.8473), (1L, 1L, 0.8473), (2L, 1L, 1.2528)),
      s"got $rows")
  }

  test("LM perplexity: common phrasing scores below rare phrasing, counts weighted") {
    // doc 0 repeats one common bigram 3×; doc 1 is three distinct rare ones
    val d = docsDir(Seq(
      (0L, "x y x y x y", "s"),
      (1L, "p q r s t u", "s"),
      (2L, "x y", "s"), (3L, "x y", "s"))) // boost c12(x,y)
    val byId = CorpusOps.lmPerplexity(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byId(0L)._1 == 5L, "5 bigram positions, dup pairs weighted by count")
    assert(byId(0L)._2 < byId(1L)._2,
      "doc made of corpus-frequent bigrams must score lower nll than rare one")
  }

  test("heavy hitters: CMS candidates superset the true heavy set, verify trims exactly") {
    // "hot" 60×, "warm" 30×, 50 distinct cold tokens 1× each
    val d = docsDir(
      (0L to 5L).map(i => (i, Seq.fill(10)("hot").mkString(" "), "s")) ++
      (6L to 8L).map(i => (i, Seq.fill(10)("warm").mkString(" "), "s")) ++
      Seq((9L, (0 until 50).map(i => s"cold$i").mkString(" "), "s")))
    val got = CorpusOps.heavyHitters(spark, d, minFreq = 40L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(("hot", 60L)), s"only the true heavy hitter survives, got $got")
    // threshold at 25 admits both, ordered freq desc
    val both = CorpusOps.heavyHitters(spark, d, minFreq = 25L).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(both == Seq(("hot", 60L), ("warm", 30L)))
  }

  test("agg maintenance: merged partials equal a from-scratch recompute") {
    val dir = "/root/testdata/sf0.001"
    val merged = CorpusOps.aggMaintenance(spark, dir).collect().toSeq
    val scratch = Tables.t(spark, dir, "documents")
      .select(col("doc_id"), col("source"), col("lang"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("n_tok"),
        col("n_chars"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        max(col("n_chars")).as("max_chars"), min(col("doc_id")).as("min_id"))
      .orderBy("source", "lang").collect().toSeq
    assert(merged == scratch,
      "monoid merge of (corpus, batch) partials must equal the full recompute")
  }

  test("length quantiles: selection picks exact order statistics") {
    // source "a": lengths 1..10 → k50 = ⌈5⌉ = 5th → 5; k90 = ⌈9⌉ = 9th → 9;
    // k99 = ⌈9.9⌉ = 10th → 10. Single-doc source: all quantiles = its value.
    val d = docsDir(
      (1L to 10L).map(i => (i, "x" * i.toInt, "a")).map { case (i, tx, s) => (i, tx, s) } ++
      Seq((99L, "y" * 7, "b")))
    val got = CorpusOps.lengthQuantiles(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(("a", 10L, 5L, 9L, 10L), ("b", 1L, 7L, 7L, 7L)),
      s"got ${got.toSeq}")
  }

  test("q79-q83 and q88-q89 run non-degenerate on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    for ((name, q) <- CorpusOps.queries) {
      val n = q(spark, dir).count()
      assert(n > 0, s"$name returned no rows on the fixture")
    }
  }
}
