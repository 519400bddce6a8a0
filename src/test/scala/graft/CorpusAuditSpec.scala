package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.CorpusAudit

/** Value-level checks for the round-4 corpus-audit operators
  * (q111/q113/q114/q115) on controlled fixtures. */
class CorpusAuditSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    val d = java.nio.file.Files.createTempDirectory("audit").toString
    rows.map { case (id, tx, src) => (id, tx, "en", src, tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("PMI ranks an always-together pair above an independent one") {
    // "p q" occur ONLY together (30 times); filler tokens are twice as
    // frequent and split across two pair types, so their PMI is lower.
    val rows = (0 until 30).map(i => (i.toLong, "p q", "s")) ++
      (30 until 60).map(i => (i.toLong, "f1 f2 f1 f2", "s"))
    val r = CorpusAudit.pmiCollocations(spark, docsDir(rows), minCount = 25)
      .collect()
    assert(r.nonEmpty)
    val top = r.head
    assert((top.getString(0), top.getString(1)) == (("p", "q")))
    // exact arithmetic: c12=30, n2=30+90 (filler emits 3 pairs × 30 docs),
    // c1=c2=30, n1=60+120 → PMI = ln 9
    val pmi = math.rint(math.log((30.0 / 120) / ((30.0 / 180) * (30.0 / 180))) * 1e4) / 1e4
    assert(top.getDouble(5) == pmi)
    // the exclusive pair beats the frequent-but-split filler pair (ln 4.5)
    val f = r.find(x => x.getString(0) == "f1" && x.getString(1) == "f2").get
    assert(f.getDouble(5) < top.getDouble(5))
  }

  test("source-term affinity surfaces a source's private vocabulary") {
    // "zzz" appears only in source A (25 times — above min support);
    // shared filler is spread evenly.
    val rows = (0 until 25).map(i => (i.toLong, "zzz common words here", "A")) ++
      (25 until 50).map(i => (i.toLong, "common words here also", "B"))
    val r = CorpusAudit.sourceTermAffinity(spark, docsDir(rows), minCount = 20)
      .collect()
    val aTop = r.filter(_.getString(0) == "A").minBy(_.getLong(1))
    assert(aTop.getString(2) == "zzz", "the private term must rank first for A")
    // a term unique to A has score ln(c_st/c_s / (c_t/c_all)) with c_st=c_t
    assert(aTop.getDouble(5) > 0)
  }

  test("schema union fills evolved columns with nulls and keeps provenance") {
    val d = docsDir(Seq(
      (0L, "alpha beta", "s"), (1L, "gamma delta", "s"),
      (2L, "epsilon zeta", "s"), (3L, "eta theta", "s"),
      (4L, "iota kappa", "s"))) // id 4 excluded from the legacy snapshot
    val r = CorpusAudit.schemaUnion(spark, d).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getLong(1) == 9, "5 current + 4 legacy docs")        // n_docs
    assert(row.getLong(2) == 4, "legacy rows have null lang")       // n_legacy
    assert(row.getLong(4) == 5, "only current rows carry n_chars")  // n_with_chars
    // sentinel sum = sum of current n_chars + (-1 per legacy row)
    val expected = Seq("alpha beta", "gamma delta", "epsilon zeta",
      "eta theta", "iota kappa").map(_.length.toLong).sum - 4
    assert(row.getLong(3) == expected)
  }

  test("upsert merge classifies insert/carry/update/noop per doc") {
    val longText = ("x " * 80).trim // 159 chars → truncated legacy differs
    val d = docsDir(Seq(
      (0L, "short stable text", "s"),   // both versions, same digest → noop
      (1L, longText, "s"),              // both, legacy truncated → update
      (3L, "legacy only", "s"),         // 3 % 7 = 3 → absent from new → carry
      (9L, "new only", "s")))           // 9 % 5 = 4 → absent from legacy → insert
    val r = CorpusAudit.upsertMerge(spark, d).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(0L -> "noop", 1L -> "update", 3L -> "carry", 9L -> "insert"))
  }

  test("scd2 history spans stable rows and versions changed ones") {
    val longText = ("y " * 80).trim
    val d = docsDir(Seq(
      (0L, "short stable text", "s"),
      (1L, longText, "s"),
      (3L, "legacy only", "s"),
      (9L, "new only", "s")))
    val r = CorpusAudit.scd2History(spark, d).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3), x.getBoolean(4)))
    val byDoc = r.groupBy(_._1)
    assert(byDoc(0L).toSeq == Seq((0L, 1L, 2L, true)), "stable doc spans v1..v2")
    assert(byDoc(1L).toSet == Set((1L, 1L, 1L, false), (1L, 2L, 2L, true)),
      "changed doc closes v1 and opens a current v2")
    assert(byDoc(3L).toSeq == Seq((3L, 1L, 1L, false)), "removed doc closes at v1")
    assert(byDoc(9L).toSeq == Seq((9L, 2L, 2L, true)), "new doc opens at v2")
  }

  test("cluster lang purity: mixed cluster flagged, tie breaks to lowest lang") {
    val d = java.nio.file.Files.createTempDirectory("purity").toString
    val t1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val t2 = "one two three four five six seven eight nine ten"
    // cluster {0,1}: identical text, en vs de → mixed, tie → top "de";
    // cluster {2,3}: identical text, both fr → pure; doc 4: singleton,
    // must not appear (q62 labels only docs with at least one pair).
    Seq((0L, t1, "en"), (1L, t1, "de"), (2L, t2, "fr"), (3L, t2, "fr"),
        (4L, "lonely words entirely unshared by anyone", "en"))
      .map { case (id, tx, lg) => (id, tx, lg, "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = CorpusAudit.clusterLangPurity(spark, d).collect()
      .map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getString(3), x.getDouble(4),
          x.getBoolean(5)))).toMap
    assert(r.keySet == Set(0L, 2L), "singletons carry no cluster row")
    assert(r(0L) == ((2L, 2L, "de", 0.5, true)), "tie-break on lang asc")
    assert(r(2L) == ((2L, 1L, "fr", 1.0, false)))
  }

  test("datasheet drift: per-source deltas and sentinels for one-sided sources") {
    // ids 0-4 in source s: legacy = {0,1,2,3} (4%5=4 out), current =
    // {0,1,2,4} (3%7=3 out). id 3 alone carries source t: present in
    // legacy only → sentinel row.
    val d = docsDir(Seq(
      (0L, "a b", "s"), (1L, "c d", "s"), (2L, "e f", "s"),
      (4L, "g h i", "s"), (3L, "x y z w", "t")))
    val r = CorpusAudit.datasheetDrift(spark, d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getLong(5), x.getLong(6)))).toMap
    assert(r("s") == ((3L, 4L, 1L, 6L, 9L, 3L)),
      "source s gains doc 4 (3 tokens) in the current snapshot")
    assert(r("t") == ((1L, -1L, -1L, 4L, -1L, -4L)),
      "legacy-only source carries -1 sentinels and negative deltas")
  }

  test("effective tokens count each dup cluster once, singletons as themselves") {
    val ten = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val five = "uno dos tres cuatro cinco"
    val four = "eins zwei drei vier"
    // s1: dup pair {0,1} (10 tokens each, one canonical) + unique doc 2
    // → raw 25, effective 15, discount 0.4; s2: untouched singleton.
    val d = docsDir(Seq(
      (0L, ten, "s1"), (1L, ten, "s1"), (2L, five, "s1"), (3L, four, "s2")))
    val r = CorpusAudit.effectiveTokens(spark, d).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r("s1") == ((3L, 25L, 15L, 0.4)))
    assert(r("s2") == ((1L, 4L, 4L, 0.0)))
  }

  test("vocab overlap computes pairwise Jaccard and drops disjoint pairs") {
    // a = {w1 w2 w3}, b = {w2 w3 w4} → |∩| = 2, |∪| = 4, J = 0.5;
    // c shares nothing → the (a,c)/(b,c) pairs must be ABSENT (the
    // intersection join is inner in both engines), not present with 0.
    val d = docsDir(Seq(
      (0L, "w1 w2", "a"), (1L, "w2 w3", "a"),
      (2L, "w2 w3 w4", "b"),
      (3L, "zz", "c")))
    val r = CorpusAudit.sourceVocabOverlap(spark, d).collect()
      .map(x => (x.getString(0), x.getString(1)) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    assert(r.keySet == Set(("a", "b")), "disjoint pairs carry no row")
    assert(r(("a", "b")) == ((2L, 3L, 3L, 0.5)))
  }

  test("dedup curve rises exactly when re-crawled content arrives") {
    // bucket 0 (ids 0-49): all unique; bucket 1 (ids 50-99): all copies
    // of doc 0
    val rows = (0 until 50).map(i => (i.toLong, s"unique text $i", "s")) ++
      (50 until 100).map(i => (i.toLong, "unique text 0", "s"))
    val r = CorpusAudit.dedupCurve(spark, docsDir(rows)).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getDouble(3)))).toMap
    assert(r(0L) == ((50L, 0L, 0.0)))
    assert(r(1L) == ((100L, 50L, 0.5)))
  }

  test("q191: identical sources sketch to est 1.0 with exact jaccard 1.0; " +
      "partial overlap is exact; result is repartition-invariant") {
    // x and y carry the SAME shingle set {abc,bcd,cde,def}; z shares
    // exactly {abc,bcd} with each (n=6, jaccard 2/8)
    val dir = docsDir(Seq(
      (1L, "a b c d e f", "x"),
      (2L, "a b c d e f", "y"),
      (3L, "a b c d x y z w", "z")))
    val out = CorpusAudit.sourceOverlapSketch(spark, dir).collect()
    val byPair = out.map(r => (r.getString(0), r.getString(1)) ->
      ((r.getLong(2), r.getLong(3), r.getLong(4),
        r.getDouble(5), r.getDouble(6)))).toMap
    assert(byPair.keySet == Set(("x", "y"), ("x", "z"), ("y", "z")))
    assert(byPair(("x", "y")) == ((4L, 4L, 4L, 1.0, 1.0)),
      "identical sets: every per-function min coincides, est is exactly 1")
    assert(byPair(("x", "z"))._1 == 4L && byPair(("x", "z"))._2 == 6L &&
      byPair(("x", "z"))._3 == 2L && byPair(("x", "z"))._4 == 0.25)
    assert(byPair(("x", "z"))._5 == byPair(("y", "z"))._5,
      "same sets must sketch identically regardless of which docs carry them")
    // determinism under partitioning (min is order-free)
    val again = CorpusAudit.sourceOverlapSketch(spark, dir)
      .collect().map(_.toSeq).toSeq
    assert(again == out.map(_.toSeq).toSeq)
  }
}
