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

  test("stableOwned reports exactly the blocks this materialization pinned") {
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val (built, owned) = Materialize.stableOwned(
      spark.range(2000).select(col("id"), (col("id") * 2).as("v")))
    assert(built.count() == 2000)
    assert(owned.nonEmpty, "a localCheckpoint must pin at least one block")
    assert(owned.forall(!before.contains(_)), "owned ids must be NEW blocks")
    assert(owned.forall(sc.getPersistentRDDs.contains),
      "owned ids must still be persisted right after the build")
  }

  test("concurrent materialized + releaseTransient never breaks a memo frame") {
    // The round-8 ADVICE race: (a) a sweep between checkpoint and
    // registration unpersists the about-to-be-memoized blocks
    // (lineage-truncated → later reads THROW); (b) a lost-race loser
    // unpersists a concurrent query's blocks swept into its delta.
    // Hammer N builder threads per key against a sweeper thread; every
    // returned frame must stay readable afterwards.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
      val sweeper = scala.concurrent.Future {
        while (!stop.get()) Materialize.releaseTransient(spark)
      }
      val rounds = (1 to 6).map { r =>
        val key = s"materialize-race-$r-${System.nanoTime()}"
        val builders = (1 to 4).map { _ =>
          scala.concurrent.Future {
            SessionMemo.materialized(spark, key)(
              spark.range(300L * r).select(col("id"), (col("id") + r).as("w")))
          }
        }
        (r, builders)
      }
      val frames = rounds.map { case (r, fs) =>
        (r, fs.map(f => scala.concurrent.Await.result(
          f, scala.concurrent.duration.Duration(120, "s"))))
      }
      stop.set(true)
      scala.concurrent.Await.result(sweeper,
        scala.concurrent.duration.Duration(120, "s"))
      // One more sweep AFTER the dust settles, then read every frame:
      // a block the bookkeeping failed to protect makes count() throw.
      Materialize.releaseTransient(spark)
      frames.foreach { case (r, built) =>
        built.foreach(df => assert(df.count() == 300L * r)) }
    } finally pool.shutdownNow()
  }
}
