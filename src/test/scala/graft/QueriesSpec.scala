package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session for all suites — one JVM-wide SparkSession. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

/** Smoke + invariant tests for the driver-facing query catalog.
  * Full value-level correctness is the DuckDB differential gate
  * (tools/check.py); these specs pin cheap structural invariants. */
class QueriesSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sfDir)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }

  test("date dim generates exactly 731 days with pandas dow numbering") {
    val rows = ops.CoreQueries.dateDim(spark, sfDir).collect()
    assert(rows.length == 731)
    val first = rows.head // 2000-01-01 was a Saturday → pandas dow 5
    assert(first.getAs[Int]("date_key") == 20000101)
    assert(first.getAs[Int]("day_of_week") == 5)
    assert(first.getAs[Boolean]("is_weekend"))
  }

  test("dedup is idempotent") {
    val once = ops.CoreQueries.dedupFirstPerKey(spark, sfDir)
    assert(once.groupBy("c_nationkey").count().filter("count > 1").count() == 0)
  }

  test("rollup carries grand-total row") {
    val r = ops.JoinSetQueries.regionRollup(spark, sfDir)
      .filter("region_name IS NULL AND nation_name IS NULL")
    assert(r.count() == 1)
  }

  test("conditional-sum pivot equals filtered sums (A1 equivalence)") {
    import org.apache.spark.sql.functions._
    val li = Tables.t(spark, sfDir, "lineitem")
    val viaCase = li.agg(
      sum(when(col("l_returnflag") === "N", col("l_quantity")).otherwise(0.0))).head.getDouble(0)
    val viaFilter = li.filter(col("l_returnflag") === "N")
      .agg(sum(col("l_quantity"))).head.getDouble(0)
    assert(math.abs(viaCase - viaFilter) < 1e-6)
  }

  test("semi + anti partition the customer table") {
    import org.apache.spark.sql.functions.col
    val c = Tables.t(spark, sfDir, "customer").count()
    val withOrders = Tables.t(spark, sfDir, "customer")
      .join(Tables.t(spark, sfDir, "orders"),
        col("c_custkey") === col("o_custkey"), "left_semi").count()
    val without = ops.JoinSetQueries.idleCustomers(spark, sfDir).count()
    assert(withOrders + without == c)
  }
}
