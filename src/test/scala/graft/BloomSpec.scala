package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BloomFunctions._
import graft.llm.TextOps

/** Bloom-sketch semi-join pruning: the wrapped Spark sketch pair
  * (bloom_filter_agg / might_contain), the scalar-subquery plumbing,
  * and the q92 contract — Bloom prefilter + exact verify must be
  * byte-identical to the exact broadcast path (q68). */
class BloomSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("sketch has no false negatives and a sane false-positive rate") {
    val sketch = spark.range(0, 1000)
      .select(bloom_filter_agg(xxhash64(col("id")), 1000L, 1L << 20).as("bf"))
    val probeAll = spark.range(0, 20000)
      .filter(in_bloom(sketch, xxhash64(col("id"))))
      .count()
    // every inserted key must probe true (Bloom guarantees no false
    // negatives); of the 19000 non-members at 1M bits / 1000 items the
    // expected false-positive count is ~0
    assert(probeAll >= 1000, s"false negative: only $probeAll of 1000 members hit")
    assert(probeAll < 1100, s"false-positive rate implausibly high: $probeAll")
  }

  test("sketch functions are registered SQL surface (scalar-subquery form)") {
    val n = spark.sql(
      """SELECT count(*) AS n FROM range(0, 2000)
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(xxhash64(id), 500L, 5000L) FROM range(0, 500)),
        |  xxhash64(id))""".stripMargin).head.getLong(0)
    assert(n >= 500 && n < 700, s"SQL bloom probe count out of range: $n")
  }

  test("q92 bloom path is row-identical to q68's exact broadcast path") {
    val dir = "/root/testdata/sf0.001"
    val exact = TextOps.decontaminate(spark, dir).collect().toSeq
    val bloom = TextOps.bloomDecontaminate(spark, dir).collect().toSeq
    assert(bloom == exact,
      "Bloom prefilter must be an optimization, not a semantic: " +
        "false positives have to die in the exact verify join")
  }
}
