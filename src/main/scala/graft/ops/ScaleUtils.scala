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

  /** Deliberately skewed join, salted end-to-end: 70% of events collapse
    * onto one hot group key (the classic null-ish default-key pathology
    * — at 1000 executors an unsalted shuffle join would put 70% of the
    * fact on one reducer), joined to the key→attributes dim through
    * [[saltedJoinDeterministic]] so the hot key spreads over 8 reducers.
    * Both sides carry a merge hint: at fixture scale the dim would
    * otherwise broadcast and no skew would exist to demonstrate — the
    * hint forces the shuffle topology the salt is for. Salting is pure
    * plan surgery, so the result provably equals the plain join: the
    * DuckDB oracle IS the unsalted join, making this the rare scale
    * utility whose correctness is driver-hash-checked. Plan shape
    * (join key extended with __salt) is pinned in ScaleUtilsSpec. */
  def skewSaltedJoin(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    import graft.Tables.t
    val ev = t(s, dir, "events")
      .withColumn("grp_key",
        when(col("user_id") % 10 < 7, lit(0L)).otherwise(col("user_id")))
    val dim = ev.select(col("grp_key")).distinct()
      .withColumn("grp_label",
        concat(lit("grp_"), (col("grp_key") % 7).cast("string")))
    saltedJoinDeterministic(
      ev.hint("merge"), dim.hint("merge"), "grp_key", col("event_id"), 8)
      .groupBy("grp_label")
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"))
      .orderBy("grp_label")
  }

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("q60_skew_salted_join" -> skewSaltedJoin)

  val oracleSql: Map[String, String] = Map(
    "q60_skew_salted_join" ->
      """WITH ev AS (
        |  SELECT CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS grp_key,
        |         user_id
        |  FROM events),
        |dim AS (
        |  SELECT DISTINCT grp_key,
        |         'grp_' || CAST(grp_key % 7 AS VARCHAR) AS grp_label
        |  FROM ev)
        |SELECT grp_label,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |FROM ev JOIN dim USING (grp_key)
        |GROUP BY grp_label
        |ORDER BY grp_label""".stripMargin)
}
