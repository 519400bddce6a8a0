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
}
