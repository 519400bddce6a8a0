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
}
