package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cheap perf-regression gate for the per-row kernel paths.
  *
  * The regression class this catches is the one the soak has caught
  * twice (SURVEY §8.13/§8.15): a fused Catalyst kernel silently swapped
  * for its composed higher-order-function form, which runs as an
  * INTERPRETED lambda per row — a 10-20× slowdown that tiny sf0.001
  * fixtures hide under session overhead and the sf0.1 bench tolerates
  * as "one slow query". A 20000-doc synthetic corpus (materialized
  * before the clock starts) is the smallest scale where the fused form
  * (~0.5-1 s here) and the interpreted form (~12 s for even the cheapest
  * composed shingling, far more for signature-over-shingles) are separated by
  * far more than VM noise.
  *
  * Bounds are ~8-12× the warm fused time on an idle VM — generous
  * enough for the documented 2-3× ambient throttling swings (§8.11),
  * far below the interpreted form. Verified red: swapping
  * `shingle_array` for the composed `NearDupOps.shingles` (or
  * `shingle_minhash` for signature-over-composed-shingles) blows the
  * bound by an order of magnitude.
  */
class PerfGateSpec extends AnyFunSuite {
  import TestSpark._

  /** 5000 docs × 120 pseudo-random tokens from a 997-word vocabulary —
    * deterministic column algebra, no I/O, materialized so generation
    * cost never lands inside a timed window. */
  private lazy val docs: DataFrame = {
    val words = (0 until 120).map(i =>
      concat(lit(s"w"), pmod(col("doc_id") * lit(31 + i) + lit(i * 7), lit(997))))
    spark.range(20000).select(col("id").as("doc_id"))
      .select(col("doc_id"), concat_ws(" ", words: _*).as("text"))
      .localCheckpoint()
  }

  private def timed(name: String, boundSec: Double)(df: => DataFrame): Unit = {
    docs.count() // ensure the fixture is materialized
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"$name: $sec%.2f s (bound $boundSec%.0f)")
    assert(sec < boundSec,
      s"$name took $sec s (bound $boundSec s) — the fused kernel path has " +
        "regressed to an interpreted/composed form; see HashKernels")
  }

  test("shingle_minhash (q43's signature path) stays fused") {
    timed("shingle_minhash", 6) {
      docs.select(col("doc_id"),
        graft.functions.HashKernels.shingle_minhash(col("text"), 3, 64).as("sig"))
    }
  }

  test("shingle_array (q44/q107/q140's shingling path) stays fused") {
    timed("shingle_array", 6) {
      docs.select(col("doc_id"),
        size(graft.functions.HashKernels.shingle_array(col("text"), 3)).as("n"))
    }
  }

  test("simhash64 stays fused") {
    timed("simhash64", 6) {
      docs.select(col("doc_id"),
        graft.functions.HashKernels.simhash64(col("text")).as("sh"))
    }
  }

  test("shingle_tf_vector (q48's vectorizer) stays fused") {
    timed("shingle_tf_vector", 6) {
      docs.select(col("doc_id"),
        graft.functions.HashKernels.shingle_tf_vector(col("text"), 3, 64).as("v"))
    }
  }

  test("winnow_fingerprint stays fused") {
    timed("winnow_fingerprint", 6) {
      docs.select(col("doc_id"),
        size(graft.functions.HashKernels.winnow_fingerprint(col("text"), 8, 16)).as("n"))
    }
  }
}
