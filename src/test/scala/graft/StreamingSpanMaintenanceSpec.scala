package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingSpanMaintenance

/** The TWELFTH maintainer family (duplicated spans): streamed state
  * must report EXACTLY like q198's one-shot run over the union of
  * every delivered doc — including the retroactive case unique to this
  * family, where a later batch flips an EARLIER batch's position from
  * unique to duplicated (segments are immutable; the probe resolves
  * flips from the landed n=1 positions). Standard three legs plus the
  * flip: stream ≡ batch, replay idempotence, re-delivery harmlessness,
  * and fold-invariance (the size trigger must be invisible in state).
  */
class StreamingSpanMaintenanceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def toks(n: Int, tag: String): Seq[String] =
    (0 until n).map(i => s"$tag$i")
  private val span = toks(8, "sp").mkString(" ")

  private def docsFrame(rows: Seq[(Long, String, String)]) =
    rows.toDF("doc_id", "text", "source")

  // batch 0: doc 1 carries `span` ONCE (unique at arrival), doc 2 is
  // clean; batch 1: doc 11 re-delivers `span` (the FLIP: doc 1's
  // position becomes duplicated retroactively) and doc 12 duplicates
  // within itself; batch 2: doc 21 matches doc 12's repeated content
  // (dup against earlier state at arrival time)
  private val rep = toks(8, "rr").mkString(" ")
  private val b0 = Seq(
    (1L, s"$span ${toks(4, "a").mkString(" ")}", "web"),
    (2L, toks(12, "c").mkString(" "), "wiki"))
  private val b1 = Seq(
    (11L, s"$span ${toks(3, "b").mkString(" ")}", "web"),
    (12L, s"$rep $rep", "wiki"))
  private val b2 = Seq(
    (21L, s"$rep ${toks(2, "d").mkString(" ")}", "web"))

  private def reportOf(delta: String): Seq[Seq[Any]] =
    StreamingSpanMaintenance.report(spark, delta)
      .collect().map(_.toSeq.toSeq).toSeq

  private def freshOf(rows: Seq[(Long, String, String)]): Seq[Seq[Any]] =
    graft.llm.TextOps.dupSpansOf(docsFrame(rows), StreamingSpanMaintenance.K)
      .collect().map(_.toSeq.toSeq).toSeq

  test("streamed span state reports exactly like the one-shot q198 run, " +
      "including the retroactive unique->duplicated flip of an earlier " +
      "batch's position") {
    val delta = java.nio.file.Files.createTempDirectory("ssm").toString
    val fn = StreamingSpanMaintenance.spanMaintain(delta) _
    fn(docsFrame(b0), 0L)
    // after batch 0 nothing is duplicated — the unique span's position
    // is parked in dgn, not in any run
    val early = reportOf(delta)
    assert(early == freshOf(b0), s"early=$early")
    assert(early.forall(_(4) == 0L), "nothing should be duplicated yet")
    fn(docsFrame(b1), 1L)
    fn(docsFrame(b2), 2L)
    val got = reportOf(delta)
    val want = freshOf(b0 ++ b1 ++ b2)
    assert(got == want, s"got=$got want=$want")
    // non-vacuous: doc 1's flipped span contributes web dup tokens
    assert(got.find(_.head == "web").get(4).asInstanceOf[Long] >= 16L,
      "the flip must surface doc 1's and doc 11's span tokens")
  }

  test("span replay is idempotent (batch-keyed overwrite, " +
      "strictly-before reads)") {
    val delta = java.nio.file.Files.createTempDirectory("ssm-rep").toString
    val fn = StreamingSpanMaintenance.spanMaintain(delta) _
    fn(docsFrame(b0), 0L)
    fn(docsFrame(b1), 1L)
    val before = reportOf(delta)
    fn(docsFrame(b1), 1L) // crash-replay of the same batch id
    assert(reportOf(delta) == before, "replay drifted the span state")
  }

  test("re-delivered docs are excluded (counts are not presence: a doc " +
      "grammed twice would spuriously duplicate its unique grams)") {
    val delta = java.nio.file.Files.createTempDirectory("ssm-redeliv").toString
    val fn = StreamingSpanMaintenance.spanMaintain(delta) _
    fn(docsFrame(b0), 0L)
    fn(docsFrame(b1), 1L)
    val before = reportOf(delta)
    fn(docsFrame(Seq(b0.head)), 2L) // doc 1 arrives again, new batch id
    assert(reportOf(delta) == before,
      "re-delivered doc must not flip its own unique grams")
  }

  test("the fold trigger is invisible in span state (fold-every-batch " +
      "twin equals the unfolded twin)") {
    val d1 = java.nio.file.Files.createTempDirectory("ssm-f1").toString
    val d0 = java.nio.file.Files.createTempDirectory("ssm-f0").toString
    val folded = StreamingSpanMaintenance.spanMaintain(d1, foldSegments = 1) _
    val plain = StreamingSpanMaintenance.spanMaintain(d0, foldSegments = 0) _
    Seq(b0, b1, b2).zipWithIndex.foreach { case (b, i) =>
      folded(docsFrame(b), i.toLong); plain(docsFrame(b), i.toLong)
    }
    assert(reportOf(d1) == reportOf(d0), "fold changed the span report")
    assert(reportOf(d1) == freshOf(b0 ++ b1 ++ b2))
  }
}
