package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-durability knob: every lineage-cutting site in the repo
  * routes through [[Materialize.stable]], which defaults to
  * `localCheckpoint` (right at local[32]) and switches to reliable
  * `checkpoint()` under `spark.graft.reliableCheckpoint=true` (right on
  * a cluster, where an unreplicated localCheckpoint block dies with its
  * executor). This spec exercises the reliable path end-to-end through
  * a query that checkpoints in three places (collapse frame, edge list,
  * label rounds) and pins output equality across the two modes.
  */
class MaterializeSpec extends AnyFunSuite {
  import TestSpark._

  test("reliable-checkpoint mode produces identical results to localCheckpoint") {
    val dir = "/root/testdata/sf0.001"
    val baseline = llm.NearDupOps.dupClusters(spark, dir).collect().toSeq
    spark.conf.set(Materialize.ReliableFlag, "true")
    spark.conf.set(Materialize.DirKey,
      java.nio.file.Files.createTempDirectory("graft-ckpt").toString)
    try {
      val reliable = llm.NearDupOps.dupClusters(spark, dir).collect().toSeq
      assert(reliable == baseline,
        "reliable checkpoint mode changed query output")
      assert(spark.sparkContext.getCheckpointDir.nonEmpty,
        "reliable mode must have installed a checkpoint dir")
    } finally {
      spark.conf.unset(Materialize.ReliableFlag)
      spark.conf.unset(Materialize.DirKey)
    }
  }

  test("default mode cuts lineage without a checkpoint dir requirement") {
    val df = Materialize.stable(
      spark.range(100).select(col("id"), (col("id") * 2).as("v")))
    assert(df.count() == 100)
  }

  test("releaseTransient drops dead checkpoint blocks but never a memoized frame") {
    val sc = spark.sparkContext
    // A query-local checkpoint: dead the moment its action returns.
    val transient = Materialize.stable(
      spark.range(1000).select(col("id"), (col("id") * 3).as("v")))
    assert(transient.count() == 1000)
    // A memoized frame: must survive the release and stay readable.
    val memoKey = s"materialize-spec-memo-${System.nanoTime()}"
    val memo = SessionMemo.materialized(spark, memoKey)(
      spark.range(500).select(col("id"), (col("id") + 7).as("w")))
    assert(memo.count() == 500)
    val persistedBefore = sc.getPersistentRDDs.size
    assert(persistedBefore >= 2, "both frames should hold persisted blocks")
    Materialize.releaseTransient(spark)
    val keep = SessionMemo.protectedRddIds(spark)
    // Everything still persisted is protected; the transient's blocks
    // are gone from the persistent set.
    sc.getPersistentRDDs.keysIterator.foreach { id =>
      assert(keep.contains(Int.box(id)),
        s"unprotected RDD $id survived releaseTransient")
    }
    // The memoized frame is still fully readable after the sweep —
    // its blocks were never dropped (localCheckpoint truncates lineage,
    // so a dropped block would make this throw, not recompute).
    assert(memo.count() == 500)
    assert(SessionMemo.materialized(spark, memoKey)(
      sys.error("memo must not rebuild")).count() == 500)
  }
}
