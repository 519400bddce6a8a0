package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's own Bloom-filter expressions (the pair
  * that powers runtime row-level filtering, SPARK-32268): an aggregate
  * that builds a `BloomFilter` sketch binary from xxhash64 values, and
  * the `might_contain` probe against it.
  *
  * Why expose them: a Bloom sketch is the scale-safe way to ship a
  * large key SET to the big side of a join. Broadcasting the exact key
  * set costs its full width; the sketch costs ~10 bits per element at
  * 1% false positives — two orders of magnitude less network and
  * executor memory — and false positives are removed by the exact join
  * that follows, so the composed operator stays EXACT (see
  * `TextOps.bloomDecontaminate`). `might_contain` requires the sketch
  * to arrive as a scalar subquery (or constant); use
  * [[GraftSqlBridge.scalarSubquery]] to lift the one-row aggregate
  * frame into the probe expression.
  */
object BloomFunctions {

  /** Aggregate: Bloom sketch over a LONG column (feed `xxhash64(key)`).
    * `estimatedItems` sizes the hash count, `numBits` the bit array —
    * ~10 bits/item gives ~1% false positives (Bloom 1970). */
  def bloom_filter_agg(c: Column, estimatedItems: Long, numBits: Long): Column =
    GraftSqlBridge.column(
      BloomFilterAggregate(GraftSqlBridge.expression(c),
        Literal(estimatedItems), Literal(numBits), 0, 0).toAggregateExpression())

  /** Probe: true when `value` (a LONG, same hash as the build side) may
    * be in the sketch; false is definite absence. */
  def might_contain(bloom: Column, value: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(value)))

  /** The composed probe: a predicate that is true iff `value` might be
    * in `sketch` — a ONE-ROW frame whose single column is the already-
    * aggregated [[bloom_filter_agg]] binary. The frame executes once as
    * a scalar subquery; every probing task shares the result. */
  def in_bloom(sketch: DataFrame, value: Column): Column =
    might_contain(GraftSqlBridge.scalarSubquery(sketch), value)
}
