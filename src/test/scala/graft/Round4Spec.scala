package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{NearDupOps, VectorOps}
import graft.streaming.StreamOps

/** Value-level checks for the round-4 batch-2 operators: IVF index
  * maintenance (q106), chunk-granular near-dup (q107), and the sliding-
  * window streaming twin (q108). */
class Round4Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("ivf add: frozen-centroid assignment matches the trainer's own cells") {
    val idx = llm.IvfIndex.ensure(spark, sfDir)
    val own = spark.read.parquet(s"$idx/lists")
      .filter(pmod(col("vec_id"), lit(10)) === 7)
      .select(col("vec_id"), col("cell").as("own_cell"))
    val added = VectorOps.ivfAddAssignments(spark, sfDir)
    val joined = own.join(added, Seq("vec_id")).collect()
    assert(joined.nonEmpty, "ingest batch must be non-empty")
    assert(own.count() == added.count(), "every batch vector gets a cell")
    val mismatched = joined.count(r => r.getInt(1) != r.getInt(2))
    assert(mismatched == 0,
      s"$mismatched batch vectors assigned to a different cell than the trainer chose")
  }

  test("chunk near-dup finds planted cross-document chunk copies only") {
    def words(prefix: String, n: Int): String =
      (0 until n).map(i => s"$prefix$i").mkString(" ")
    val shared = words("s", 40) // one full chunk width
    val d = java.nio.file.Files.createTempDirectory("chunknd").toString
    Seq(
      // doc 0 and doc 1 share their first 40-token chunk verbatim,
      // then diverge completely
      (0L, shared + " " + words("a", 30)),
      (1L, shared + " " + words("b", 30)),
      // doc 2 is unrelated
      (2L, words("c", 70)),
      // doc 3 near-copies doc 0's shared chunk with one MIDDLE token
      // changed (an edit at position 21 breaks 3 shingles)
      (3L, shared.replace("s20", "zz") + " " + words("e", 30)))
      .map { case (id, tx) => (id, tx, "en", "s", tx.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    val r = NearDupOps.chunkNearDup(spark, d).collect()
      .map(x => ((x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)),
        x.getDouble(4))).toMap
    // exact chunk copy: jaccard 1.0
    assert(r.get((0L, 0L, 1L, 0L)).contains(1.0))
    // one mid-chunk token edit: 38 shingles per side, 35 shared (the 3
    // shingles covering the edited token differ) → 35/41 ≈ 0.8537 < 0.9
    assert(!r.contains((0L, 0L, 3L, 0L)),
      "sub-threshold fuzzy pair must not survive the 0.9 verify")
    // unrelated docs never pair
    assert(!r.keys.exists(k => k._1 == 2L || k._3 == 2L))
  }

  test("streaming sliding-window counts equal the batch twin") {
    val streamDir = {
      val d = java.nio.file.Files.createTempDirectory("events-slide")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/events.parquet"),
        d.resolve("part-000.parquet"))
      d.toString
    }
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.slidingTypeCounts(StreamOps.readEvents(spark, streamDir)),
      "sliding_counts", OutputMode.Complete)
    val batch = StreamOps.slidingTypeCounts(
      StreamOps.withEventTime(
        spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)))
    val a = streamed.orderBy("ws_us", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("ws_us", "event_type").collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b))
    // every event lands in exactly two windows
    val nEvents = spark.read.schema(StreamOps.eventsRawSchema)
      .parquet(streamDir).count()
    assert(batch.agg(sum(col("n_events"))).collect()(0).getLong(0) == 2 * nEvents)
  }
}
