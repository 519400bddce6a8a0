package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{BandIndex, NearDupOps}

/** The staged incremental near-dup path (q84) against its
  * self-contained twin (q76) and the staged index's own invariants.
  *
  * q84's contract is "identical output to q76" — same directed
  * (new_doc, old_doc) brute-force >= 0.8 pair listing, with the corpus
  * side read from the offline [[BandIndex]] instead of re-banded per
  * run. The equivalence is pinned pair-for-pair (ids AND stats) at both
  * fixture scales, so any drift between the staged banding and the
  * inline banding fails here with named pairs before the oracle run.
  */
class BandIndexSpec extends AnyFunSuite {
  import TestSpark._

  private val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), (Long, Long, Double)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap

  test("q84 staged probe emits exactly q76's pair listing at every fixture scale") {
    dirs.foreach { dir =>
      val want = pairs(NearDupOps.incrementalNearDup(spark, dir))
      val got = pairs(NearDupOps.incrementalNearDupStaged(spark, dir))
      val missing = (want.keySet -- got.keySet).toSeq.sorted
      val extra = (got.keySet -- want.keySet).toSeq.sorted
      assert(missing.isEmpty && extra.isEmpty,
        s"q84@$dir pair-set drift vs q76 — missing=$missing extra=$extra")
      want.foreach { case (k, stats) =>
        assert(got(k) == stats, s"q84@$dir stats drift at $k: got ${got(k)}, want $stats")
      }
      assert(want.nonEmpty, s"q84@$dir vacuous — fixtures produced no incremental pairs")
    }
  }

  test("a non-modulo ingest boundary routes through the same staged path") {
    // The boundary is an explicit parameter, not a baked-in constant:
    // stage an index for a range-shaped batch and check the probe still
    // equals the self-contained twin under that boundary.
    val dir = "/root/testdata/sf0.001"
    val ge = BandIndex.Boundary("batch=ge300", c => c >= 300)
    val want = pairs(NearDupOps.incrementalNearDup(spark, dir, c => c >= 300))
    val got = pairs(NearDupOps.incrementalNearDupStaged(spark, dir, ge))
    assert(want.nonEmpty, s"ge300 boundary produced no pairs — fixture too sparse")
    assert(got == want,
      s"staged/self-contained drift under non-modulo boundary: " +
        s"missing=${(want.keySet -- got.keySet).toSeq.sorted} " +
        s"extra=${(got.keySet -- want.keySet).toSeq.sorted}")
  }

  test("index holds only corpus-side docs, never batch docs or raw text") {
    val dir = "/root/testdata/sf0.01"
    val idx = BandIndex.ensure(spark, dir, BandIndex.Boundary.ingestMod10)
    val digests = spark.read.parquet(s"$idx/digests")
    val bands = spark.read.parquet(s"$idx/bands")
    // Narrow schema: ids and digests only — document text never enters
    // the index (the 100 TB shuffle-hygiene rule).
    assert(digests.columns.sorted.toSeq == Seq("digest", "n_sh", "rep_id"))
    assert(bands.columns.sorted.toSeq == Seq("band", "band_n", "doc_id", "hub_rank"))
    assert(digests.filter(col("rep_id") % 10 === 7).count() == 0L,
      "batch-side doc leaked into the staged corpus index")
    assert(bands.filter(col("doc_id") % 10 === 7).count() == 0L)
    // Precomputed guard metadata is self-consistent: hub_rank is a
    // permutation of 1..band_n within each band.
    val bad = bands.groupBy("band").agg(
        max(col("band_n")).as("n"), count(lit(1)).as("c"),
        min(col("hub_rank")).as("lo"), max(col("hub_rank")).as("hi"))
      .filter(col("n") =!= col("c") || col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.count() == 0L, "bands/ band_n or hub_rank inconsistent")
  }

  test("ensure is idempotent and keyed on corpus version AND boundary") {
    val dir = "/root/testdata/sf0.001"
    val b = BandIndex.Boundary.ingestMod10
    val idx1 = BandIndex.ensure(spark, dir, b)
    val idx2 = BandIndex.ensure(spark, dir, b)
    assert(idx1 == idx2)
    assert(BandIndex.indexDir(spark, "/root/testdata/sf0.01", b) != idx1,
      "different corpora must key to different index paths")
    assert(BandIndex.indexDir(spark, dir, BandIndex.Boundary.all) != idx1,
      "different boundaries must key to different index paths — a shared " +
        "GRAFT_INDEX_DIR must never serve an index with the wrong corpus membership")
  }
}
