package graft

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamOps

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  /** events.parquet copied into a dir so the streaming file source can
    * discover it as a micro-batch. */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      d.resolve("part-000.parquet"))
    d.toString
  }

  test("streaming hourly counts equal the batch computation") {
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.hourlyTypeCounts(StreamOps.readEvents(spark, streamDir)),
      "hourly_counts", OutputMode.Complete)
    val batch = StreamOps.hourlyTypeCounts(
      StreamOps.withEventTime(
        spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)))
    val a = streamed.orderBy("window_start", "event_type").collect().map(_.toSeq)
    val b = batch.orderBy("window_start", "event_type").collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b))
  }

  test("session windows merge events within the 30-minute gap") {
    val sessions = StreamOps.runToMemory(spark,
      StreamOps.sessionWindows(StreamOps.readEvents(spark, streamDir)),
      "session_windows", OutputMode.Complete)
    assert(sessions.count() > 0)
    // session bounds are consistent
    assert(sessions.filter(col("session_end") < col("session_start")).count() == 0)
  }

  test("new files become incremental micro-batches") {
    import org.apache.spark.sql.streaming.OutputMode
    val d = java.nio.file.Files.createTempDirectory("events-inc")
    // first half / second half of events as two separate arrivals
    val all = StreamOps.withEventTime(
      spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir))
    val half = all.count() / 2
    def arrive(tag: String, pred: org.apache.spark.sql.Column): Unit = {
      val staging = java.nio.file.Files.createTempDirectory(s"stage-$tag")
      spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)
        .filter(pred).coalesce(1).write.mode("overwrite")
        .parquet(staging.toString)
      val part = java.nio.file.Files.list(staging).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, d.resolve(s"$tag.parquet"))
    }
    arrive("batch1", org.apache.spark.sql.functions.col("event_id") < half)
    val counts = StreamOps.readEvents(spark, d.toString)
      .groupBy("event_type").count()
    val q = counts.writeStream.format("memory")
      .queryName("inc_counts").outputMode(OutputMode.Complete).start()
    try {
      q.processAllAvailable()
      val n1 = spark.table("inc_counts")
        .agg(org.apache.spark.sql.functions.sum("count")).head.getLong(0)
      assert(n1 == half)
      arrive("batch2", org.apache.spark.sql.functions.col("event_id") >= half)
      q.processAllAvailable()
      val n2 = spark.table("inc_counts")
        .agg(org.apache.spark.sql.functions.sum("count")).head.getLong(0)
      assert(n2 == all.count(), s"second arrival must be incorporated ($n1 -> $n2)")
    } finally q.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    val d = java.nio.file.Files.createTempDirectory("events-dup")
    // the same file twice = every event duplicated
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), d.resolve("a.parquet"))
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"), d.resolve("b.parquet"))
    val deduped = StreamOps.runToMemory(spark,
      StreamOps.dedupEvents(StreamOps.readEvents(spark, d.toString))
        .groupBy().count(),
      "dedup_events", OutputMode.Complete)
    val expected = spark.read.schema(StreamOps.eventsRawSchema)
      .parquet(s"$sfDir/events.parquet").count()
    assert(deduped.head.getLong(0) == expected)
  }

  test("stream-stream interval join equals the batch interval join") {
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.purchaseAttribution(StreamOps.readEvents(spark, streamDir)),
      "attribution", OutputMode.Append)
    val batch = StreamOps.purchaseAttribution(
      StreamOps.withEventTime(
        spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)))
    val a = streamed.orderBy("purchase_id", "click_id").collect().map(_.toSeq)
    val b = batch.orderBy("purchase_id", "click_id").collect().map(_.toSeq)
    assert(a.nonEmpty && a.sameElements(b),
      s"stream ${a.length} rows vs batch ${b.length}")
    // attribution window is honored
    assert(streamed.filter(col("click_ts_us") > col("purchase_ts_us")).count() == 0)
    assert(streamed.filter(
      col("click_ts_us") < col("purchase_ts_us") - 30L * 60 * 1000000).count() == 0)
  }

  test("streaming transitions equal batch steps across micro-batches with late data") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val d = java.nio.file.Files.createTempDirectory("events-trans")
    val all = spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)
    // ts is TIMESTAMP_NTZ now — split on epoch micros (UTC session TZ
    // makes the cast the identity) instead of the former raw BIGINT
    def tsUs = unix_micros(c("ts").cast("timestamp"))
    val midTs = all.agg(org.apache.spark.sql.functions
      .percentile_approx(tsUs, org.apache.spark.sql.functions.lit(0.5),
        org.apache.spark.sql.functions.lit(1000))).head.getLong(0)
    def arrive(tag: String, pred: org.apache.spark.sql.Column): Unit = {
      val staging = java.nio.file.Files.createTempDirectory(s"trans-$tag")
      all.filter(pred).coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = java.nio.file.Files.list(staging).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, d.resolve(s"$tag.parquet"))
    }
    // the "late" half arrives a whole micro-batch later — steps that
    // straddle the boundary must come out identical to the batch run
    arrive("early", tsUs < midTs)
    val streamed = StreamOps.transitionsStreaming(
      StreamOps.readEvents(spark, d.toString)
        .withWatermark("ts", "10 minutes")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamOps.Event])
    val q = streamed.toDF().writeStream.format("memory")
      .queryName("trans_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      arrive("late", tsUs >= midTs)
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("trans_stream").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val batchSteps = StreamOps.transitionSteps(
      StreamOps.withEventTime(all)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamOps.Event]).collect()
      .map(s => (s.user_id, s.from_type, s.to_type))
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(emitted.nonEmpty, "watermark-final steps must be emitted")
    // every emitted step multiset entry must be a subset of the batch
    // truth (the stream can only withhold not-yet-final tail steps,
    // never invent or double-emit)
    emitted.foreach { case (k, n) =>
      assert(batchSteps.getOrElse(k, 0) >= n,
        s"stream emitted $n of $k but batch has ${batchSteps.getOrElse(k, 0)}")
    }
    val emittedTotal = emitted.values.sum
    val batchTotal = batchSteps.values.sum
    assert(emittedTotal >= batchTotal / 2,
      s"stream finalized too little: $emittedTotal of $batchTotal")
  }

  test("streaming sessionizer stitches sessions across micro-batches") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col => c}
    val d = java.nio.file.Files.createTempDirectory("events-sess")
    val all = spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)
    def tsUs = unix_micros(c("ts").cast("timestamp"))
    val midTs = all.agg(org.apache.spark.sql.functions
      .percentile_approx(tsUs, org.apache.spark.sql.functions.lit(0.5),
        org.apache.spark.sql.functions.lit(1000))).head.getLong(0)
    def arrive(tag: String, pred: org.apache.spark.sql.Column): Unit = {
      val staging = java.nio.file.Files.createTempDirectory(s"sess-$tag")
      all.filter(pred).coalesce(1).write.mode("overwrite").parquet(staging.toString)
      val part = java.nio.file.Files.list(staging).iterator().asScala
        .find(_.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, d.resolve(s"$tag.parquet"))
    }
    // time-split so some sessions span the batch boundary
    arrive("early", tsUs < midTs)
    val streamed = StreamOps.sessionizeStreaming(
      StreamOps.readEvents(spark, d.toString)
        .withWatermark("ts", "10 minutes")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamOps.Event])
    val q = streamed.toDF().writeStream.format("memory")
      .queryName("sess_stream")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Append).start()
    try {
      q.processAllAvailable()
      arrive("late", tsUs >= midTs)
      q.processAllAvailable()
    } finally q.stop()
    val emitted = spark.table("sess_stream").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(emitted.nonEmpty, "watermark-closed sessions must be emitted")
    // every emitted session must exactly match a full-data batch session —
    // a per-batch split would emit partials that match nothing
    val batchSessions = StreamOps.sessionize(
      StreamOps.withEventTime(all)
        .select("event_id", "ts", "user_id", "event_type", "value")
        .as[StreamOps.Event]).collect()
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events)).toSet
    val unmatched = emitted.diff(batchSessions)
    assert(unmatched.isEmpty,
      s"streamed sessions must match complete sessions; bad: ${unmatched.take(3)}")
  }

  test("custom sessionizer agrees with session_window on session counts") {
    import spark.implicits._
    val events = StreamOps.withEventTime(
      spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir))
      .select("event_id", "ts", "user_id", "event_type", "value")
      .as[StreamOps.Event]
    val custom = StreamOps.sessionize(events)
    val builtin = StreamOps.sessionWindows(
      StreamOps.withEventTime(
        spark.read.schema(StreamOps.eventsRawSchema).parquet(streamDir)))
    // same number of sessions per user (semantics match: 30-min gap)
    val a = custom.groupBy("user_id").count().orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val b = builtin.groupBy("user_id").count().orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(a.sameElements(b))
    // event totals conserved
    val nCustom = custom.agg(sum("n_events")).head.getLong(0)
    assert(nCustom == events.count())
  }

  test("q61 batch twin equals the streamed session_window result") {
    val batch = StreamOps.sessionWindowBatch(spark, sfDir).collect().toSeq
    val streamed = StreamOps.runToMemory(spark,
      StreamOps.sessionWindows(StreamOps.readEvents(spark, sfDir)),
      "q61_stream_twin", org.apache.spark.sql.streaming.OutputMode.Complete())
      .select(col("user_id"),
        unix_micros(col("session_start")).as("session_start_us"),
        unix_micros(col("session_end")).as("session_end_us"),
        col("n_events"), col("total_value"))
      .orderBy("user_id", "session_start_us").collect().toSeq
    assert(batch == streamed,
      s"batch/stream session_window results differ: ${batch.size} vs ${streamed.size}")
  }

  test("sessionizer totals are order-deterministic under millisecond ties") {
    import spark.implicits._
    // getTime truncates to ms, manufacturing ties; double addition is
    // non-associative; so without the (ts, event_id) tie-break the
    // total would depend on arrival order. Values chosen so the two
    // accumulation orders differ in the last ulp pre-fix.
    def ev(id: Long, v: Double) = StreamOps.Event(
      id, new java.sql.Timestamp(1700000000000L), 1L, "click", v)
    val a = Seq(ev(1, 0.1), ev(2, 0.2), ev(3, 0.025))
    def totalOf(events: Seq[StreamOps.Event]): Double =
      StreamOps.sessionize(events.toDS()).collect().head.total_value
    assert(totalOf(a) == totalOf(a.reverse) && totalOf(a) == totalOf(
      Seq(a(2), a(0), a(1))),
      "session total must not depend on same-millisecond arrival order")
  }

  test("sessionizer rounds totals with Spark round semantics on negatives") {
    import spark.implicits._
    // -0.125 is exactly representable; HALF_UP away from zero gives
    // -0.13 (what the DataFrame-side round(sum(value), 2) yields),
    // while math.round's half-toward-+inf would give -0.12.
    val events = Seq(StreamOps.Event(
      1L, new java.sql.Timestamp(1700000000000L), 1L, "refund", -0.125))
    val got = StreamOps.sessionize(events.toDS()).collect().head.total_value
    assert(got == -0.13, s"got $got, want -0.13 (HALF_UP away from zero)")
  }
}
