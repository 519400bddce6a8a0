package graft

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.NearDupOps

/** Independent-library cross-check: Spark ML's MinHashLSH over the same
  * shingle sets must agree with the hand-rolled banding pipeline on the
  * controlled corpus — exact copies at distance 0, the one-word edit at
  * small distance, unrelated docs at distance ~1. */
class MlCrossCheckSpec extends AnyFunSuite {
  import TestSpark._

  test("ml MinHashLSH distances corroborate the hand-rolled candidates") {
    val base =
      "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    val nearDup = base.replace("tonight", "today")
    val different =
      "spark executes distributed query plans with columnar parquet scans and hash joins"
    import spark.implicits._
    val docs = Seq((0L, base), (1L, nearDup), (2L, different), (3L, base))
      .toDF("doc_id", "text")
      .select(col("doc_id"), NearDupOps.shingles(col("text"), 3).as("sh"))

    val tf = new HashingTF().setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    val featured = tf.transform(docs)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(featured)
    val pairs = model.approxSimilarityJoin(featured, featured, 0.99, "dist")
      .select(col("datasetA.doc_id").as("a"), col("datasetB.doc_id").as("b"),
        col("dist"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

    // exact copies: jaccard distance 0
    assert(pairs((0L, 3L)) == 0.0)
    // one-word edit: small distance, found as candidate
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) < 0.4)
    // unrelated doc: either absent (no shared band) or near-1 distance
    assert(!pairs.get((0L, 2L)).exists(_ < 0.9))

    // agreement with the hand-rolled pipeline's verdicts on this corpus
    val dir = {
      val d = java.nio.file.Files.createTempDirectory("mlx").toString
      Seq((0L, base, "en", "s", base.length.toLong),
        (1L, nearDup, "en", "s", nearDup.length.toLong),
        (2L, different, "en", "s", different.length.toLong),
        (3L, base, "en", "s", base.length.toLong))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
      d
    }
    val mine = NearDupOps.minhashPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mine.contains((0L, 3L)) && mine.contains((0L, 1L)))
    assert(!mine.contains((0L, 2L)))
  }
}
