package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself: every oracle belongs to a real query,
  * names are well-formed and collision-free, and the flagship entry
  * returns rows — the shape the driver's smoke/correctness harness
  * assumes before any per-query check runs. */
class ContractSpec extends AnyFunSuite {
  import TestSpark._

  test("every oracle key names an implemented query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle unless on the documented rows-only allowlist") {
    // The rows-only set is CLOSED: each member is inherently
    // non-SQL-expressible (engine-specific hashing) and carries a
    // value-level spec. A new query landing without an oracle must
    // either get one or be argued onto this list explicitly.
    // q45/q54 left this list in round 7 (md5-keyed fingerprints);
    // q46/q57 left in round 9: their catalog forms are now the
    // planted-recall probes (annPlantedRecall/ivfPlantedRecall), whose
    // top-1 output is provably the brute-force exact answer and hence
    // fully DuckDB-oracle-checked; q27 left in round 10: the catalog
    // form now emits the engine-independent ACCURACY CONTRACT
    // (|approx − exact| ≤ tol·exact as 0/1 flags, each engine judging
    // its own sketch) instead of engine-specific HLL registers.
    // The list is now EMPTY — every catalog query is hash-oracled.
    val rowsOnly = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing == rowsOnly,
      s"oracle coverage drift: unexpected rows-only=${(missing -- rowsOnly).toSeq.sorted} " +
        s"now-oracled=${(rowsOnly -- missing).toSeq.sorted}")
  }

  test("query names are well-formed and their numbers unique") {
    val names = SparkEntry.queries.keySet
    assert(names.forall(_.matches("q\\d+_[a-z0-9_]+")), "bad query name format")
    val nums = names.toSeq.map(_.takeWhile(_ != '_'))
    assert(nums.distinct.size == nums.size,
      s"duplicate query numbers: ${nums.diff(nums.distinct).distinct}")
  }

  test("oracle SQL contains no tab/CR control characters that the driver's JSON path mangles") {
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(!sql.contains("\t") && !sql.contains("\r"), s"$name has tab/CR")
    }
  }

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query constructs a plan against sf0.001 fixtures") {
    // cheap end-to-end sanity: analysis + optimization succeed for every
    // catalog entry (execution is the Verify main's job)
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      try fn(spark, dir).queryExecution.optimizedPlan
      catch { case e: Exception =>
        fail(s"$name failed to plan: ${e.getMessage}")
      }
    }
  }
}
