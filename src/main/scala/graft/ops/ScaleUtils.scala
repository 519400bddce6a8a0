package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling and layout utilities for cluster-scale joins.
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; salting
  * is the plan-level tool when a known hot key would still overwhelm one
  * task (e.g. the empty-string fingerprint bucket in a dedup, a null-ish
  * default key). Bucketed table layout makes repeated co-located joins
  * shuffle-free; see ScaleUtilsSpec for the bucketed-join plan assertion.
  */
object ScaleUtils {

  /** Salted large-large join on a skewed key: the left (skewed) side gets
    * a random salt in [0, salts); the right side is exploded `salts`
    * times so every (key, salt) pair finds its match. Correct for inner
    * and left joins on `key`; the shuffle spreads each hot key over
    * `salts` tasks. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
    salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      (rand(42) * salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Deterministic variant: salt derived from hashing a second column —
    * reproducible across retries (rand() is not, under task retry). */
  def saltedJoinDeterministic(left: DataFrame, right: DataFrame, key: String,
    saltSource: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(salts.toLong)).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Write a DataFrame bucketed+sorted by a join key: subsequent joins on
    * that key between tables bucketed the same way need no exchange. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
}
