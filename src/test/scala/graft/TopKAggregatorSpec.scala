package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKAggregator
import graft.functions.TopKAggregator.Entry

/** The typed Aggregator must agree with the window row_number form
  * (q21_order_rank semantics) on every group. */
class TopKAggregatorSpec extends AnyFunSuite {
  import TestSpark._

  test("typed top-3 equals window top-3 per customer") {
    import spark.implicits._
    val orders = Tables.t(spark, sfDir, "orders")
    val typed = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .groupByKey(_._1)
      .mapValues(r => Entry(r._2, r._3))
      .agg(TopKAggregator(3).toColumn)
      .flatMap { case (cust, entries) => entries.map(e => (cust, e.id, e.value)) }
      .collect().toSet
    val window = graft.ops.WindowQueries.orderRank(spark, sfDir)
      .select("o_custkey", "o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(typed == window)
  }

  test("bounded buffer: reduce never holds more than k entries") {
    val agg = TopKAggregator(2)
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, Entry(i.toLong, i.toDouble)))
    assert(buf.size == 2)
    assert(buf.map(_.id) == Seq(100L, 99L))
    val merged = agg.merge(buf, agg.reduce(agg.zero, Entry(200L, 1000.0)))
    assert(merged.map(_.id) == Seq(200L, 100L))
  }
}
