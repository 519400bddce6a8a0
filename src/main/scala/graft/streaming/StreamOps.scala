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

  /** events schema as stored (ts is parquet timestamp[us] without
    * timezone → TIMESTAMP_NTZ). */
  val eventsRawSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Cast NTZ event time to the session TimestampType (delegates to
    * Tables' one conversion rule). */
  def withEventTime(df: DataFrame): DataFrame =
    graft.Tables.toSessionTs(df)


  /** q165 — batch twin of [[hourlyTypeCounts]] (the q61/q108 pattern
    * applied to the module's first streaming aggregation): identical
    * tumbling-window assignment over the static table, which puts the
    * hourly-rollup streaming surface under the driver's DuckDB oracle —
    * the oracle derives the window start by integer epoch-hour
    * division, exactly how `window(ts, '1 hour')` aligns. Stream ≡
    * batch is already pinned in StreamingSpec. */
  def hourlyCountsBatch(s: SparkSession, dir: String): DataFrame =
    graft.Tables.t(s, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        // DECIMAL(18,2) sum (the q61/q122/q150 money rule): a double sum
        // is merge-order dependent, so Spark's partial aggs vs DuckDB's
        // single-threaded sum could differ pre-round and flip the 2dp
        // rounding at a .005 boundary.
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(unix_micros(col("window.start")).as("ws_us"),
        col("event_type"), col("n_events"), col("total_value"))
      .orderBy("ws_us", "event_type")

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
      .agg(count(lit(1)).as("n_events"),
        // same DECIMAL money rule as the batch twin (stream ≡ batch is
        // pinned in StreamingSpec, so the two must quantize identically)
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
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

  /** Sliding-window rates: 10-minute windows advancing every 5 minutes,
    * counts per event type, 10-minute watermark. The overlapping-window
    * complement to [[hourlyTypeCounts]]'s tumbling shape — each event
    * lands in exactly two windows, state is bounded by the watermark,
    * and the per-window counts are the rate signal a monitoring
    * dashboard reads. */
  def slidingTypeCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        unix_micros(col("window.end")).as("we_us"),
        col("event_type"), col("n_events"))

  /** Batch twin of [[slidingTypeCounts]] (q108): identical window
    * assignment over the static table — an event at t belongs to the
    * two epoch-aligned 10-minute windows starting at ⌊t/5m⌋·5m and that
    * minus 5m, which is exactly how the oracle unrolls it. Stream ≡
    * batch is pinned in StreamingSpec. Timestamps export as unix micros
    * (q61's convention). */
  def slidingCountsBatch(s: SparkSession, dir: String): DataFrame =
    graft.Tables.t(s, dir, "events")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(
        unix_micros(col("window.start")).as("ws_us"),
        unix_micros(col("window.end")).as("we_us"),
        col("event_type"), col("n_events"))
      .orderBy("ws_us", "event_type")

  /** Stream-stream interval join: attribute each purchase to clicks by
    * the same user in the preceding 30 minutes. Both sides carry
    * watermarks and the join condition bounds event-time distance, so
    * state for both streams is evictable — the canonical scalable
    * stream-stream join shape (unbounded conditions would accumulate
    * state forever). */
  def purchaseAttribution(events: DataFrame): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"), col("value").as("purchase_value"))
      .withWatermark("p_ts", "10 minutes")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("c_ts"))
      .withWatermark("c_ts", "10 minutes")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES"))
      .select(col("purchase_id"), col("p_user").as("user_id"),
        col("click_id"),
        unix_micros(col("p_ts")).as("purchase_ts_us"),
        unix_micros(col("c_ts")).as("click_ts_us"),
        col("purchase_value"))
  }

  // ---- custom state: flatMapGroupsWithState sessionizer ------------------

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
    event_type: String, value: Double)

  /** THE conversion into the typed Event boundary — batch or stream.
    * `value` is a primitive Double in the encoder, so a NULL there
    * NOT_NULL-violates the deserializer mid-job (a null-dense slice is
    * routine at scale); it is not a session/transition INPUT (the
    * extractors read types and (ts, event_id) ordering; session totals
    * sum it, where 0.0 is the null-as-absent convention), so it is
    * pinned here once rather than at each call site.
    *
    * DOCUMENTED DIVERGENCE: SQL `sum(value)` skips NULLs, so a group
    * whose values are ALL null sums to NULL in the DataFrame-side
    * session/aggregate queries, while this typed path's coalesce makes
    * the same group total 0.0. The two forms agree whenever a group
    * has at least one non-null value (null ≡ absent ≡ 0.0 under
    * addition); only the all-null group distinguishes them. The typed
    * sessionizer's totals are defined as the 0.0 convention — any
    * stream≡batch comparison must compare typed against typed (as the
    * specs do), not typed against a raw SQL sum. */
  def asEvents(df: org.apache.spark.sql.DataFrame): Dataset[Event] = {
    import df.sparkSession.implicits._
    df.select(col("event_id"), col("ts"), col("user_id"),
      col("event_type"), coalesce(col("value"), lit(0.0)).as("value"))
      .as[Event]
  }
  case class SessionState(lastTs: Long, start: Long, n: Long, total: Double)
  case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  val SessionGapMs: Long = 30 * 60 * 1000L

  /** Spark's round() semantics for the session total: HALF_UP away
    * from zero on the canonical decimal rendering — `math.round`
    * (half toward +∞) would diverge from the DataFrame-side
    * `round(sum(value), 2)` on NEGATIVE .005 boundaries. */
  private def round2(x: Double): Double =
    BigDecimal(x).setScale(2, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** Split a user's (ts-millis, event_id, value) list — sorted by
    * (ts, event_id) — into gap-separated sessions. The event_id
    * tie-break matters for DETERMINISM, not session shape: getTime
    * truncates to milliseconds (manufacturing ties), double addition
    * is non-associative, and an unordered tie would make total_value
    * depend on shuffle-iterator order — differing between runs and
    * between the batch and streaming paths (the q137/stepsOf ordering
    * contract, applied to the sessionizer). */
  private def assemble(userId: Long,
      sorted: Seq[(Long, Long, Double)]): Seq[UserSession] = {
    if (sorted.isEmpty) return Nil
    val sessions = scala.collection.mutable.ArrayBuffer[UserSession]()
    var st = SessionState(sorted.head._1, sorted.head._1, 0L, 0.0)
    sorted.foreach { case (t, _, value) =>
      if (t - st.lastTs > SessionGapMs) {
        sessions += UserSession(userId,
          new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastTs),
          st.n, round2(st.total))
        st = SessionState(t, t, 1L, value)
      } else {
        st = SessionState(t, st.start, st.n + 1, st.total + value)
      }
    }
    sessions += UserSession(userId,
      new java.sql.Timestamp(st.start), new java.sql.Timestamp(st.lastTs),
      st.n, round2(st.total))
    sessions.toSeq
  }

  /** Batch per-user sessionizer: each group arrives complete in a single
    * call (flatMapGroupsWithState in batch mode), so sessions are
    * assembled directly — no cross-call state exists in batch. For
    * unbounded streams use `sessionizeStreaming`. */
  def sessionize(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], _: GroupState[SessionState]) =>
          assemble(userId,
            it.map(e => (e.ts.getTime, e.event_id, e.value)).toSeq
              .sortBy(t => (t._1, t._2))).iterator
      }
  }

  /** Buffered (ts-millis, event_id, value) events per user carried
    * across micro-batches (event_id rides along as the tie-break).
    *
    * STATE-SCHEMA BREAK (round 9): the encoding changed from
    * List[(Long, Double)] to List[(Long, Long, Double)] when event_id
    * joined as the tie-break. flatMapGroupsWithState state is decoded
    * with THIS encoder — a streaming query resuming from a checkpoint
    * written by the pre-change build will fail to decode its state.
    * Upgrading across that commit requires a fresh checkpoint dir
    * (drain the old query, start clean); there is no in-place state
    * migration for case-class encoders. */
  case class SessionBuffer(events: List[(Long, Long, Double)])

  /** Streaming per-user sessionizer with genuine cross-batch state.
    *
    * Events buffer in GroupState; on every batch the buffered+incoming
    * events are assembled into sessions and every session already CLOSED
    * by the watermark (end + gap < watermark, so no admissible late
    * event can extend or merge it) is emitted immediately, keeping only
    * the open tail in state. This bounds state for an always-active
    * user — without the in-update emission, such a user re-arms the
    * timeout forever, buffers unboundedly, and never emits. The
    * event-time timeout covers users who simply go quiet. Input must
    * carry a watermark on `ts`. */
  def sessionizeStreaming(events: Dataset[Event]): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionBuffer]) =>
          if (state.hasTimedOut) {
            // watermark passed lastEvent + gap: everything left is closed
            val buffered = state.get.events.sortBy(t => (t._1, t._2))
            state.remove()
            assemble(userId, buffered).iterator
          } else {
            val incoming = it.map(e => (e.ts.getTime, e.event_id, e.value)).toList
            val merged = (state.getOption.map(_.events).getOrElse(Nil) ++ incoming)
              .sortBy(t => (t._1, t._2))
            val watermark = state.getCurrentWatermarkMs()
            val closed = assemble(userId, merged).filter(
              s => s.session_end.getTime + SessionGapMs < watermark)
            val cutoff = closed.lastOption.map(_.session_end.getTime)
              .getOrElse(Long.MinValue)
            val retained = merged.filter(_._1 > cutoff) // the open tail
            if (retained.isEmpty) state.remove()
            else {
              state.update(SessionBuffer(retained))
              state.setTimeoutTimestamp(
                math.max(retained.iterator.map(_._1).max + SessionGapMs + 1,
                  watermark + 1))
            }
            closed.iterator
          }
      }
  }

  // ---- custom state: cross-batch transition extractor --------------------

  case class Step(user_id: Long, from_type: String, to_type: String)
  /** Buffered (us, event_id, type) triples per user across batches. */
  case class TransBuffer(events: List[(Long, Long, String)])

  /** Microsecond event time from a Timestamp without losing the
    * sub-millisecond digits (`getTime` alone truncates to ms). */
  private def usOf(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

  /** Consecutive (from → to) steps of a (us, event_id)-sorted list —
    * the q137 ordering contract. */
  private def stepsOf(userId: Long, sorted: Seq[(Long, Long, String)]): Seq[Step] =
    sorted.sliding(2).collect {
      case Seq(a, b) => Step(userId, a._3, b._3)
    }.toSeq

  /** Batch per-user step extractor (each group arrives complete in one
    * call — the sessionize pattern). */
  def transitionSteps(events: Dataset[Event]): Dataset[Step] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransBuffer, Step](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], _: GroupState[TransBuffer]) =>
          stepsOf(userId,
            it.map(e => (usOf(e.ts), e.event_id, e.event_type)).toSeq
              .sortBy(x => (x._1, x._2))).iterator
      }
  }

  /** Streaming step extractor with genuine cross-batch state: events
    * buffer per user; a step (a → b) is emitted once b's event time is
    * below the watermark — at that point no admissible late event can
    * land between a and b (any such event's time would be < b < the
    * watermark), so the step is FINAL. Only the unfinalized tail stays
    * in state (the sessionizeStreaming bounding argument: the in-update
    * emission keeps an always-active user's buffer from growing without
    * bound; the event-time timeout flushes users who go quiet). */
  def transitionsStreaming(events: Dataset[Event]): Dataset[Step] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransBuffer, Step](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[TransBuffer]) =>
          if (state.hasTimedOut) {
            val buffered = state.get.events.sortBy(x => (x._1, x._2))
            // Flush the quiet user's steps, but RETAIN the last event as
            // the seed of the bridging step (last flushed → first future
            // event). Removing the whole buffer would permanently lose
            // that step vs batch transitionSteps/q137 semantics when the
            // user resumes after the quiet period. No new timeout is
            // armed: the seed is one triple per quiet user (bounded
            // state) and is picked up by the next data batch.
            state.update(TransBuffer(List(buffered.last)))
            stepsOf(userId, buffered).iterator
          } else {
            val merged = (state.getOption.map(_.events).getOrElse(Nil) ++
              it.map(e => (usOf(e.ts), e.event_id, e.event_type)).toList)
              .sortBy(x => (x._1, x._2))
            val wmUs = state.getCurrentWatermarkMs() * 1000L
            // count of leading steps whose SECOND endpoint is final
            val nFinal = merged.sliding(2).takeWhile {
              case Seq(_, b) => b._1 < wmUs
              case _ => false
            }.size
            val emit = stepsOf(userId, merged).take(nFinal)
            // merged(nFinal) is the last final endpoint — it seeds the
            // next step, so the retained tail starts there
            val retained = merged.drop(nFinal)
            if (retained.isEmpty) state.remove()
            else {
              state.update(TransBuffer(retained))
              state.setTimeoutTimestamp(math.max(
                retained.iterator.map(_._1).max / 1000L + 1,
                state.getCurrentWatermarkMs() + 1))
            }
            emit.iterator
          }
      }
  }

  /** q153 — the q137 transition matrix computed through the STATEFUL
    * step extractor (flatMapGroupsWithState in batch mode) instead of a
    * lead() window: same ordering contract, same output, same DuckDB
    * oracle — which is exactly what puts the custom-state streaming
    * surface under the driver's correctness gate. The streaming form
    * ([[transitionsStreaming]]) shares `stepsOf`, and StreamingSpec pins
    * stream ≡ batch across micro-batches including a late arrival. */
  def statefulTransitions(s: SparkSession, dir: String): DataFrame = {
    val ev = asEvents(graft.Tables.t(s, dir, "events"))
    transitionSteps(ev).toDF()
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(
          org.apache.spark.sql.expressions.Window.partitionBy("from_type")), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Streaming exact dedup on event_id with bounded state: duplicates
    * arriving within the watermark window are dropped, state for ids
    * older than the watermark is evicted — the at-least-once →
    * effectively-once repair stage of an ingest pipeline. */
  def dedupEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Batch twin of [[sessionWindows]] — the same built-in
    * `session_window` aggregation applied to the static events table
    * (one declarative shape for both execution modes is the Structured
    * Streaming contract, so this is the form that puts the streaming
    * surface under the driver's DuckDB oracle: session start = first
    * event, end = last event + gap, checked against a gaps-and-islands
    * SQL twin). Timestamps export as unix micros; total_value follows
    * q47's round(sum, 2) convention. */
  def sessionWindowBatch(s: SparkSession, dir: String): DataFrame =
    graft.Tables.t(s, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("total_value"))
      .select(col("user_id"),
        unix_micros(col("sw.start")).as("session_start_us"),
        unix_micros(col("sw.end")).as("session_end_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start_us")

  /** Batch twin of [[purchaseAttribution]] (q118): the same interval-
    * join DataFrame code over the static table (the join predicate and
    * projections are identical; only the watermarks are streaming-side
    * no-ops in batch). All (purchase, click-within-preceding-30min)
    * pairs per user — the stream-stream join output, now under a full
    * DuckDB oracle; stream ≡ batch is pinned in StreamingSpec. */
  def purchaseAttributionBatch(s: SparkSession, dir: String): DataFrame =
    purchaseAttribution(graft.Tables.t(s, dir, "events"))
      .orderBy("purchase_id", "click_id")

  /** q135 — event-time disorder profile: how far behind its key's
    * running event-time maximum each event arrives (arrival order =
    * event_id), bucketed into on-time / <1min / <1h / ≥1h. This is THE
    * statistic that sizes `withWatermark` for every streaming query in
    * this module: the delay must cover the disorder tail you intend to
    * keep, and the share you cut is exactly the late-drop rate you
    * accept. Per-KEY disorder (not global) because state eviction and
    * dedup windows key the same way the aggregations do.
    *
    * Plan: one window over (user_id, event_id) — the partitioning the
    * events table already uses for sessionization — then a 4-row
    * aggregate; all microsecond integer arithmetic, no floats until the
    * final share. */
  def disorderProfile(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("event_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val lateness = graft.Tables.t(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("prev_max_us", max(unix_micros(col("ts"))).over(w))
      .select(greatest(lit(0L),
        coalesce(col("prev_max_us") - unix_micros(col("ts")), lit(0L)))
        .as("late_us"))
    val buckets = lateness.select(
      when(col("late_us") === 0, "0_ontime")
        .when(col("late_us") < 60000000L, "1_under_1m")
        .when(col("late_us") < 3600000000L, "2_under_1h")
        .otherwise("3_over_1h").as("bucket"),
      col("late_us"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_events"), max(col("late_us")).as("max_late_us"))
    val tot = buckets.agg(sum(col("n_events")).as("total"))
    buckets.crossJoin(broadcast(tot))
      .select(col("bucket"), col("n_events"), col("max_late_us"),
        round(col("n_events").cast("double") / col("total"), 4).as("share"))
      .orderBy("bucket")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q61_session_window" -> sessionWindowBatch,
      "q108_sliding_counts" -> slidingCountsBatch,
      "q118_purchase_attribution" -> purchaseAttributionBatch,
      "q135_disorder_profile" -> disorderProfile,
      "q153_stateful_transitions" -> statefulTransitions,
      "q165_hourly_type_counts" -> hourlyCountsBatch)

  val oracleSql: Map[String, String] = Map(
    "q165_hourly_type_counts" ->
      """SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS ws_us,
        |  event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY ws_us, event_type""".stripMargin,
    // q153 must equal q137 exactly — shared oracle by construction.
    "q153_stateful_transitions" ->
      graft.ops.StatOps.oracleSql("q137_event_transitions"),
    "q135_disorder_profile" ->
      """WITH l AS (SELECT
        |    GREATEST(CAST(0 AS BIGINT), COALESCE(
        |      MAX(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      - epoch_us(ts), 0)) AS late_us
        |  FROM events),
        |b AS (SELECT CASE WHEN late_us = 0 THEN '0_ontime'
        |    WHEN late_us < 60000000 THEN '1_under_1m'
        |    WHEN late_us < 3600000000 THEN '2_under_1h'
        |    ELSE '3_over_1h' END AS bucket, late_us FROM l),
        |g AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_events,
        |    CAST(MAX(late_us) AS BIGINT) AS max_late_us
        |  FROM b GROUP BY 1),
        |t AS (SELECT CAST(SUM(n_events) AS BIGINT) AS total FROM g)
        |SELECT bucket, n_events, max_late_us,
        |  round(CAST(n_events AS DOUBLE) / total, 4) AS share
        |FROM g CROSS JOIN t ORDER BY bucket""".stripMargin,
    "q118_purchase_attribution" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id,
        |    epoch_us(ts) AS purchase_ts_us, value AS purchase_value
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT event_id AS click_id, user_id, epoch_us(ts) AS click_ts_us
        |      FROM events WHERE event_type = 'click')
        |SELECT purchase_id, user_id, click_id, purchase_ts_us, click_ts_us,
        |  purchase_value
        |FROM p JOIN c USING (user_id)
        |WHERE click_ts_us <= purchase_ts_us
        |  AND click_ts_us >= purchase_ts_us - 1800000000
        |ORDER BY purchase_id, click_id""".stripMargin,
    "q108_sliding_counts" ->
      """WITH w AS (SELECT event_type,
        |    unnest([CAST(floor(epoch_us(ts) / 300000000) AS BIGINT) * 300000000,
        |            CAST(floor(epoch_us(ts) / 300000000) AS BIGINT) * 300000000
        |              - 300000000]) AS ws_us
        |  FROM events)
        |SELECT ws_us, ws_us + 600000000 AS we_us, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM w GROUP BY ws_us, event_type
        |ORDER BY ws_us, event_type""".stripMargin,
    "q61_session_window" ->
      """WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS ts_us, value, event_id FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |                   OR ts_us - lag(ts_us) OVER w > 1800000000
        |                 THEN 1 ELSE 0 END AS new_s
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
        |sess AS (
        |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |                             ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id,
        |  MIN(ts_us) AS session_start_us,
        |  MAX(ts_us) + 1800000000 AS session_end_us,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  ROUND(SUM(value), 2) AS total_value
        |FROM sess GROUP BY user_id, sid
        |ORDER BY user_id, session_start_us""".stripMargin)

  /** Run a streaming DataFrame to completion against the files currently
    * in the source directory, returning the materialized result (memory
    * sink, one query name per call). `mode` is deliberately explicit:
    * Append on a watermarked aggregate withholds every window the
    * watermark has not passed — silently missing the newest rows — so
    * the caller must choose the semantics. */
  def runToMemory(s: SparkSession, streamed: DataFrame, name: String,
    mode: OutputMode): DataFrame = {
    val q = streamed.writeStream
      .format("memory").queryName(name).outputMode(mode).start()
    try q.processAllAvailable() finally q.stop()
    s.table(name)
  }
}
