package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.PostingIndex
import org.apache.spark.sql.functions._

/** Index-hygiene checks for the staged posting index (q130/q132),
  * mirroring BandIndexSpec: cache-key identity, atomic-publish
  * completeness, and corpus-membership discipline. */
class PostingIndexSpec extends AnyFunSuite {
  import TestSpark._

  test("ensure is idempotent and keyed on corpus version AND boundary") {
    val dir = "/root/testdata/sf0.001"
    val idx1 = PostingIndex.ensure(spark, dir)
    val idx2 = PostingIndex.ensure(spark, dir)
    assert(idx1 == idx2)
    assert(PostingIndex.indexDir(spark, "/root/testdata/sf0.01",
      PostingIndex.Boundary.all) != idx1,
      "different corpora must key to different index paths")
    assert(PostingIndex.indexDir(spark, dir,
      PostingIndex.Boundary.ingestMod10) != idx1,
      "different boundaries must key to different index paths")
  }

  test("published index is complete and holds no batch docs or raw text") {
    val dir = "/root/testdata/sf0.001"
    val idx = PostingIndex.ensure(spark, dir, PostingIndex.Boundary.ingestMod10)
    // completeness marker written last
    assert(new java.io.File(s"$idx/stats/_SUCCESS").exists())
    val postings = spark.read.parquet(s"$idx/postings")
    assert(!postings.columns.contains("text"), "no raw text in the index")
    assert(postings.filter(pmod(col("doc_id"), lit(10)) === 7).count() == 0,
      "batch docs must not be staged")
    // doclen and df re-derive from postings exactly
    val dlFromPostings = postings.groupBy("doc_id")
      .agg(sum("tf").as("dl2"))
    val dl = spark.read.parquet(s"$idx/doclen")
    assert(dl.join(dlFromPostings, Seq("doc_id"))
      .filter(col("dl") =!= col("dl2")).count() == 0)
    val stats = spark.read.parquet(s"$idx/stats").collect().head
    assert(stats.getLong(0) == dl.count())
  }

  test("partition buckets agree between the build column and the driver-side rule") {
    val dir = "/root/testdata/sf0.001"
    val idx = PostingIndex.ensure(spark, dir)
    val mismatches = spark.read.parquet(s"$idx/postings")
      .select(col("term"), col("pbucket"))
      .distinct().collect()
      .count(r => r.getString(1) != PostingIndex.bucketOf(r.getString(0)))
    assert(mismatches == 0,
      "a probe's driver-computed bucket literals must hit the partition " +
        "directories the build wrote, or pruning silently misses postings")
  }
}
