package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.MultimodalOps

class MultimodalSpec extends AnyFunSuite {
  import TestSpark._

  test("media table carries binary payloads with consistent metadata") {
    val m = MultimodalOps.mediaTable(spark, sfDir)
    assert(m.schema("payload").dataType.typeName == "binary")
    // n_bytes metadata matches actual payload length
    assert(m.filter(length(col("payload")) =!= col("meta.n_bytes")).count() == 0)
  }

  test("feature extraction is deterministic and batch-size invariant") {
    val ds = MultimodalOps.mediaDataset(spark, sfDir)
    val a = MultimodalOps.extractFeatures(ds, batchSize = 64)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    val b = MultimodalOps.extractFeatures(ds.repartition(5), batchSize = 7)
      .collect().map(f => f.doc_id -> f.features.toSeq).toMap
    assert(a == b, "batching/partitioning must not change features")
    assert(a.values.forall(_.length == 8))
  }

  test("empty payloads produce zero features, not errors") {
    val empt = MultimodalOps.extractFeatures(MultimodalOps.mediaDataset(spark, sfDir))
      .filter(f => f.n_bytes == 0).collect()
    assert(empt.forall(_.features.forall(_ == 0.0f)))
  }

  test("resize plan preserves aspect ratio within 224 bound") {
    val r = MultimodalOps.resizePlan(spark, sfDir)
    assert(r.filter(col("out_width") > 224 || col("out_height") > 224).count() == 0)
    assert(r.filter(col("out_width") =!= 224 && col("out_height") =!= 224).count() == 0,
      "longest side should hit the 224 target")
  }

  test("frame sampling explodes one row per frame") {
    val f = MultimodalOps.frameSamplePlan(spark, sfDir)
    val perDoc = f.groupBy("doc_id").count()
    val expected = MultimodalOps.mediaTable(spark, sfDir)
      .filter(col("format") === "mp4")
      .select(col("doc_id"), (col("doc_id") % 5 + 2).as("n"))
    val joined = perDoc.join(expected, "doc_id")
      .filter(col("count") =!= col("n"))
    assert(joined.count() == 0)
  }
}
