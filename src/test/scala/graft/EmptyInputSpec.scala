package graft

import org.scalatest.funsuite.AnyFunSuite

/** Empty-input robustness sweep: every catalog query must EXECUTE over
  * a schema-correct, zero-row copy of the full fixture. At 100 TB this
  * is not an edge case — partition pruning, a tenant filter, or a
  * brand-new ingest slice routinely hands an operator zero rows, and an
  * operator that throws there (k-means on an empty summarizer, a staged
  * write that emits no schema-bearing part file, a head() on an empty
  * aggregate) fails a 1000-executor job that should have produced an
  * empty result. Round-8 findings this sweep caught and their fixes:
  * IvfIndex.build now stages a schema-stable empty index instead of
  * fitting k-means on zero vectors, and PostingIndex.build inlines the
  * partition column with repartition(1) so empty staged tables still
  * carry their schema for later reads.
  */
class EmptyInputSpec extends AnyFunSuite {
  import TestSpark._

  test("every catalog query executes over a zero-row fixture") {
    val src = "/root/testdata/sf0.001"
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    Tables.all.foreach { n =>
      spark.read.parquet(s"$src/$n.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    val failures = SweepHarness.sweepCatalog(spark, dir)
    assert(failures.isEmpty,
      s"${failures.size} queries fail on empty input:\n  " +
        failures.mkString("\n  "))
  }
}
