package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{CorpusOps, TextOps}

/** q187 paragraph dedup (CCNet-shaped sub-document dedup) and q188
  * cross-snapshot cluster provenance. The DuckDB oracle pins exact
  * output on the fixture; these specs pin what the oracle cannot see —
  * the first-occurrence SEMANTICS on a hand corpus, invariance of the
  * result under input partitioning (the min-struct canonicalization is
  * order-free; a window-based implementation would be too, but a
  * first()/head-based one would not), and q188's status algebra. */
class ParagraphDedupSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def p(tag: String) =
    (1 to 10).map(i => s"$tag$i").mkString(" ")

  // para A appears in docs 5 and 9; doc 5 wins (lower id). Doc 12 has a
  // 15-token tail: its second paragraph is the 5-token remainder. Doc 20
  // repeats para A at BOTH positions: only its first occurrence in the
  // corpus order matters — both of doc 20's copies drop. Doc 11 is empty.
  private lazy val docs = Seq(
    (5L, p("a") + " " + p("b")),
    (9L, p("a") + " " + p("c")),
    (11L, ""),
    (12L, p("d") + " " + (1 to 5).map(i => s"e$i").mkString(" ")),
    (20L, p("a") + " " + p("a"))
  ).toDF("doc_id", "text")

  test("q187: corpus-wide first occurrence survives, later copies drop, " +
      "cleaned text keeps original order") {
    val out = TextOps.paragraphDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(5)))).toMap
    assert(out(5L) == ((2L, 2L, 0L, p("a") + " " + p("b"))),
      "doc 5 owns the first occurrence of both its paragraphs")
    assert(out(9L) == ((2L, 1L, 1L, p("c"))),
      "doc 9's copy of para A drops; its own para survives")
    assert(out(11L) == ((0L, 0L, 0L, "")), "empty doc: zero paragraphs")
    assert(out(12L) ==
      ((2L, 2L, 0L, p("d") + " " + (1 to 5).map(i => s"e$i").mkString(" "))),
      "short tail is its own paragraph")
    assert(out(20L) == ((2L, 0L, 2L, "")),
      "both of doc 20's copies of para A lose to doc 5")
  }

  test("q187: result is invariant under input partitioning") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      TextOps.paragraphDedup(df).collect().map(_.toSeq.toSeq).toSeq
    val one = rows(docs.repartition(1))
    assert(rows(docs.repartition(13)) == one)
    assert(rows(docs.repartition(4, col("text"))) == one)
  }

  test("q187 on the fixture: conservation and flag coherence") {
    val out = TextOps.paragraphDedup(spark, sfDir)
    val r = out.agg(
      sum(col("n_paras")).as("p"), sum(col("n_kept")).as("k"),
      sum(col("n_dropped")).as("d"),
      sum(when(col("n_kept") + col("n_dropped") =!= col("n_paras"), 1L)
        .otherwise(0L)).as("bad")).collect()(0)
    assert(r.getLong(3) == 0, "kept + dropped must equal paras per doc")
    assert(r.getLong(0) == r.getLong(1) + r.getLong(2))
    assert(r.getLong(1) > 0)
  }

  test("q189: corpus occurrences beat batch occurrences regardless of " +
      "doc_id; batch-internal dups keep their first occurrence") {
    val root = java.nio.file.Files.createTempDirectory("pdedup").toString
    // corpus doc 20 owns para A; batch docs 7 and 17 re-crawl it (7 <
    // 20, so a plain (doc_id, pos) rank would WRONGLY keep doc 7's
    // copy); batch docs 7 and 17 share para B, absent in the corpus.
    Seq(
      (7L, p("a") + " " + p("b")),
      (17L, p("b") + " " + p("c")),
      (20L, p("a") + " " + p("d"))
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$root/documents.parquet")
    val out = graft.llm.TextOps.paragraphDedupIncremental(spark, root)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(5))))
      .toMap
    assert(out.keySet == Set(7L, 17L), "output is batch docs only")
    assert(out(7L) == ((2L, 1L, p("b"))),
      "para A loses to the corpus even though 7 < 20; para B is first")
    assert(out(17L) == ((2L, 1L, p("c"))),
      "para B's batch-internal second occurrence drops")
  }

  test("q190: the staged-index plan answers exactly like q189 — hand " +
      "corpus (where rank order could betray it) and fixture") {
    val root = java.nio.file.Files.createTempDirectory("pstaged").toString
    // same adversarial shape as the q189 test: batch id 7 < corpus id
    // 20, so an index that leaked rank information (rather than pure
    // digest presence) could wrongly let the batch win.
    Seq(
      (7L, p("a") + " " + p("b")),
      (17L, p("b") + " " + p("c")),
      (20L, p("a") + " " + p("d"))
    ).toDF("doc_id", "text")
      .select(col("doc_id"), col("text"), lit("en").as("lang"),
        lit("web").as("source"),
        length(col("text")).cast("long").as("n_chars"))
      .write.parquet(s"$root/documents.parquet")
    def rows(f: => org.apache.spark.sql.DataFrame) =
      f.collect().map(_.toSeq.toSeq).toSeq
    val handWant = rows(TextOps.paragraphDedupIncremental(spark, root))
    assert(handWant.nonEmpty &&
      rows(TextOps.paragraphDedupStaged(spark, root)) == handWant)
    val fixWant = rows(TextOps.paragraphDedupIncremental(spark, sfDir))
    assert(fixWant.nonEmpty &&
      rows(TextOps.paragraphDedupStaged(spark, sfDir)) == fixWant)
  }

  test("q188: status algebra is coherent with the snapshot boundaries") {
    val out = CorpusOps.clusterDiff(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (id, oc, os, nc, ns, st) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))
      val (inOld, inNew) = (id % 10 != 7, id % 10 != 3)
      assert((st == "added") == !inOld, s"doc $id: $st")
      assert((st == "removed") == (inOld && !inNew), s"doc $id: $st")
      if (!inOld) assert(oc == -1L && os == 0L)
      else assert(oc >= 0L && os >= 1L && oc <= id,
        s"doc $id: canon is a min over ids incl. self")
      if (!inNew) assert(nc == -1L && ns == 0L)
      else assert(nc >= 0L && ns >= 1L && nc <= id)
      st match {
        case "recanonicalized" => assert(oc != nc)
        case "merged" => assert(oc == nc && ns > os)
        case "split" => assert(oc == nc && ns < os)
        case "unchanged" => assert(oc == nc && ns == os)
        case _ =>
      }
    }
    // the fixture's drift produces every transition class
    val statuses = out.map(_.getString(5)).toSet
    assert(Set("added", "removed", "unchanged").subsetOf(statuses), statuses)
  }
}
