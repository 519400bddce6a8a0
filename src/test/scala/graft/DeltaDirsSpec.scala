package graft

import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.DeltaDirs

/** The shared `b<id>` delta-directory read: the half-written-batch
  * degradation contract (ADVICE r9). A maintainer that crashes BETWEEN
  * its two segment writes (semDedupMaintain lands b<N>/edges, dies
  * before b<N>/vecs) leaves a batch dir where one sub exists and the
  * other doesn't. An unbounded probe-time read (batchId = MaxValue —
  * which no replay ever heals, since replays bound strictly below)
  * must degrade to MISSING ROWS for the absent sub — exactly the state
  * a replay of that batch will overwrite — not throw
  * path-does-not-exist forever. */
class DeltaDirsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val schema = StructType(Seq(StructField("x", LongType)))

  test("half-written batch degrades to missing rows, not an exception") {
    val root = java.nio.file.Files.createTempDirectory("deltadirs").toString
    // b0 crashed between writes: edges landed, vecs did not.
    Seq(10L).toDF("x").write.parquet(s"$root/b0/edges")
    // b1 completed both.
    Seq(20L).toDF("x").write.parquet(s"$root/b1/edges")
    Seq(21L).toDF("x").write.parquet(s"$root/b1/vecs")
    val edges = DeltaDirs.readSegs(spark, root, "edges", schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    val vecs = DeltaDirs.readSegs(spark, root, "vecs", schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(edges == Seq(10L, 20L))
    assert(vecs == Seq(21L), "b0's missing vecs sub must read as no rows")
    // Replay of b0 (strictly-before read at batchId=0) sees neither.
    assert(DeltaDirs.readSegs(spark, root, "vecs", schema, 0L).isEmpty)
  }

  test("empty sub-name path still reads whole batch dirs") {
    val root = java.nio.file.Files.createTempDirectory("deltadirs2").toString
    Seq(1L).toDF("x").write.parquet(s"$root/b0")
    Seq(2L).toDF("x").write.parquet(s"$root/b7")
    new java.io.File(s"$root/not-a-batch").mkdirs()
    val all = DeltaDirs.readSegs(spark, root, "", schema)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(all == Seq(1L, 2L))
  }

  private def rows(root: String, sub: String, batchId: Long = Long.MaxValue) =
    DeltaDirs.readSegs(spark, root, sub, schema, batchId)
      .collect().map(_.getLong(0)).sorted.toSeq

  private def dirNames(root: String) =
    new java.io.File(root).listFiles().map(_.getName).sorted.toSeq

  test("compaction is row-preserving, prunes covered dirs, " +
      "half-written covered batch still degrades to missing rows") {
    val root = java.nio.file.Files.createTempDirectory("deltadirs3").toString
    Seq(10L).toDF("x").write.parquet(s"$root/b0/edges")
    Seq(11L).toDF("x").write.parquet(s"$root/b0/vecs")
    // b1 crashed between writes: edges landed, vecs did not.
    Seq(20L).toDF("x").write.parquet(s"$root/b1/edges")
    Seq(30L).toDF("x").write.parquet(s"$root/b2/edges")
    Seq(31L).toDF("x").write.parquet(s"$root/b2/vecs")
    val subs = Seq("edges" -> schema, "vecs" -> schema)
    val before = (rows(root, "edges"), rows(root, "vecs"))
    // fold strictly below batch 2 (the in-flight batch keeps its dir)
    assert(DeltaDirs.compact(spark, root, subs, 2L))
    assert(dirNames(root) == Seq("b2", "c1"),
      "b0/b1 folded into c1; in-flight b2 untouched")
    assert((rows(root, "edges"), rows(root, "vecs")) == before,
      "compacted read must equal the uncompacted read row-for-row")
    // nothing new landed: no new watermark, state unchanged
    assert(!DeltaDirs.compact(spark, root, subs, 2L))
    assert(dirNames(root) == Seq("b2", "c1"))
  }

  test("replay across compaction sees identical rows") {
    val root = java.nio.file.Files.createTempDirectory("deltadirs4").toString
    (0L to 4L).foreach(i => Seq(i * 10).toDF("x").write.parquet(s"$root/b$i"))
    val subs = Seq("" -> schema)
    // batch 5 is replaying: its strictly-before read, then the
    // compaction batch 5 performed before the crash, then the re-read.
    val before = rows(root, "", 5L)
    assert(DeltaDirs.compact(spark, root, subs, 5L))
    assert(rows(root, "", 5L) == before)
    assert(before == Seq(0L, 10L, 20L, 30L, 40L))
  }

  test("crash windows: markerless fold is invisible; published fold " +
      "with unpruned inputs never double-counts; next compact prunes") {
    val root = java.nio.file.Files.createTempDirectory("deltadirs5").toString
    (0L to 2L).foreach(i => Seq(i).toDF("x").write.parquet(s"$root/b$i"))
    val subs = Seq("" -> schema)
    // window 1: fold written but rename never happened (stale tmp) —
    // and a markerless c dir (non-atomic-FS crash during rename)
    Seq(99L).toDF("x").write.parquet(s"$root/c1.tmp-deadbeef")
    Seq(98L).toDF("x").write.parquet(s"$root/c0")
    assert(rows(root, "") == Seq(0L, 1L, 2L),
      "stale tmp and markerless c dir must be invisible to readers")
    // window 2: a complete fold landed but the prune crashed — simulate
    // by compacting, then re-creating a covered b dir as the leftover
    assert(DeltaDirs.compact(spark, root, subs, 3L))
    Seq(0L).toDF("x").write.parquet(s"$root/b0")
    assert(rows(root, "") == Seq(0L, 1L, 2L),
      "covered b dir below the watermark must not double-count")
    // the next compact call (even with nothing new) finishes the prune
    assert(!DeltaDirs.compact(spark, root, subs, 3L))
    assert(dirNames(root) == Seq("c2"))
    assert(rows(root, "") == Seq(0L, 1L, 2L))
  }

  test("liveness: a markerless c dir AT the next watermark (crashed " +
      "non-atomic publish) is healed, not renamed-onto — compact " +
      "converges instead of throwing forever") {
    val root = java.nio.file.Files.createTempDirectory("deltadirs6").toString
    (0L to 2L).foreach(i => Seq(i).toDF("x").write.parquet(s"$root/b$i"))
    val subs = Seq("" -> schema)
    // the crash: a previous compact's rename onto c2 died mid-copy on a
    // non-atomic FS, leaving a partial c2 WITHOUT the marker — and with
    // garbage rows a reader must never see
    Seq(777L).toDF("x").write.parquet(s"$root/c2")
    assert(rows(root, "") == Seq(0L, 1L, 2L),
      "partial markerless c2 must be invisible to readers")
    // the replay recomputes the same watermark; without the heal the
    // rename would NEST the tmp inside the leftover c2 (marker nested →
    // readers skip forever) while prune deletes the inputs — row loss
    assert(DeltaDirs.compact(spark, root, subs, 3L))
    assert(dirNames(root) == Seq("c2"))
    assert(rows(root, "") == Seq(0L, 1L, 2L),
      "the healed publish must carry exactly the folded rows")
    // and it stays stable
    assert(!DeltaDirs.compact(spark, root, subs, 3L))
    assert(rows(root, "") == Seq(0L, 1L, 2L))
  }
}
