package graft

import org.apache.spark.sql.SparkSession

/** Shared fixture writers for specs that synthesize their own tables.
  *
  * `events.ts` is TIMESTAMP_NTZ on disk (schema.Schemas:57,
  * Tables.scala:27-43); a spec that writes a raw nanos BIGINT trips the
  * schema gate before its assertions run. Specs keep their ergonomic
  * epoch-nanos literals and convert here, in exactly one place.
  */
object TestFixtures {

  /** Epoch nanos (UTC) → LocalDateTime, which Spark encodes as
    * TimestampNTZType. floorDiv/floorMod so pre-epoch instants work. */
  def ntz(nanos: Long): java.time.LocalDateTime =
    java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(nanos, 1000000000L),
      Math.floorMod(nanos, 1000000000L).toInt,
      java.time.ZoneOffset.UTC)

  /** Write an events fixture matching the declared schema: ts arrives as
    * epoch nanos and lands as TIMESTAMP_NTZ. */
  def writeEvents(spark: SparkSession, dir: String,
                  rows: Seq[(Long, Long, Long, String, Double, String)]): Unit = {
    import spark.implicits._
    rows.map { case (id, tsNanos, u, ty, v, props) =>
      (id, ntz(tsNanos), u, ty, v, props)
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }
}
