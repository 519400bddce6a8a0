package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Round-4 time-series analytics: gap-filled (forward-filled) daily
  * price series and cohort retention — the two remaining classic
  * warehouse time shapes the catalog lacked.
  *
  * Both are built from the engine-portable primitives the repo
  * standardizes on: date grids come from `sequence` (the q09 generator),
  * forward fill uses the count-over grouping trick instead of
  * `IGNORE NULLS` (identical semantics, expressible in every SQL
  * dialect), and week arithmetic is integer day-diff division — no
  * locale-dependent `date_trunc('week', …)`.
  */
object TimeSeriesOps {

  /** Gap-filled daily price series — the as-of/forward-fill transform a
    * market feed needs before any day-over-day computation: for each
    * part, a dense daily grid from its first to last observation, with
    * missing days carrying the last observed price forward.
    *
    * Forward fill = the grouping trick: a running COUNT of non-null
    * observations partitions each series into segments that start at an
    * observation, and MAX over (part, segment) broadcasts it — two
    * window passes over the SAME (part, day) sort order, so Spark plans
    * one Exchange + one Sort and both windows ride it.
    *
    * Scale: the grid explodes from the per-part [min, max] span — size
    * |parts|·|days|, independent of fact-row count; the left join back
    * to observations keys on (part, day), the partitioning the grid was
    * born with. At 100 TB the fact scan reduces to (part, day, min) at
    * the scan (partial agg), so the shuffle carries one row per
    * (part, day), not per lineitem. Parts ≤ 50 bounds the fixture
    * output; the plan shape is part-count-agnostic. */
  def priceGapfill(s: SparkSession, dir: String): DataFrame = {
    val obs = t(s, dir, "lineitem")
      .filter(col("l_partkey") <= 50)
      .select(col("l_partkey").as("part"),
        to_date(col("l_shipdate")).as("day"), col("l_extendedprice"))
      .groupBy("part", "day")
      .agg(round(min(col("l_extendedprice")), 2).as("obs_price"))
    val grid = obs.groupBy("part")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("part"), explode(sequence(col("d0"), col("d1"))).as("day"))
    val wCum = Window.partitionBy("part").orderBy("day")
    grid.join(obs, Seq("part", "day"), "left")
      .withColumn("grp", count(col("obs_price")).over(wCum))
      .withColumn("price_filled",
        max(col("obs_price")).over(Window.partitionBy("part", "grp")))
      .withColumn("is_filled", col("obs_price").isNull)
      .drop("grp")
      .orderBy("part", "day")
  }

  /** Weekly cohort retention over the event stream — the
    * activation/retention matrix every product-analytics warehouse
    * computes: users are cohorted by the epoch-week of their first
    * event, and each (cohort, week-offset) cell counts the distinct
    * users still active that many weeks later, with the retention rate
    * against the cohort's size.
    *
    * Weeks are floor(days-since-2024-01-01 / 7) — pure integer
    * arithmetic, identical in every engine (date_trunc('week') is
    * locale/ISO-dependent and is avoided). Plan: one (user, week)
    * distinct aggregation (the only corpus-sized shuffle — partial
    * aggs collapse each user's events map-side), a min-week window per
    * user riding the same user-keyed exchange, then a tiny
    * (cohort, offset) rollup joined to cohort sizes. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val week = floor(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")) / 7)
    val uw = t(s, dir, "events")
      .select(col("user_id"), week.as("week"))
      .distinct()
    val wUser = Window.partitionBy("user_id")
    val cells = uw
      .withColumn("cohort_week", min(col("week")).over(wUser))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
    val sizes = cells.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_users").as("cohort_size"))
    cells.join(sizes, Seq("cohort_week"))
      .withColumn("retention",
        round(col("n_users").cast("double") / col("cohort_size"), 4))
      .select("cohort_week", "week_offset", "n_users", "cohort_size", "retention")
      .orderBy("cohort_week", "week_offset")
  }

  /** q152 — customer-lifetime-value cohort grid: customers cohorted by
    * first-order month; for each (cohort, months-since-first) cell, the
    * active-customer count, the cell revenue, the RUNNING cumulative
    * revenue, and cumulative LTV per cohort member. The q105 retention
    * grid with money on it — the table a growth analyst reads
    * column-wise ("how much is a cohort worth by age k").
    *
    * Determinism: month indexes are exact integer arithmetic
    * (year·12+month — never months_between, whose fractional semantics
    * differ across engines); revenue sums ride DECIMAL(18,2) end to
    * end, so the running cumulative is order-independent, and the only
    * division is the final per-member LTV, quantized by the cross-
    * engine midpoint rule ⌊x·10⁴+0.5⌋/10⁴ (round() disagrees between
    * engines at decimal halves — this op's cohort sums land on them).
    *
    * Plan: one customer-keyed exchange (min-month window + the cell
    * rollup share it); the cumulative window runs on the months²-sized
    * cell frame. */
  def ltvCohorts(s: SparkSession, dir: String): DataFrame = {
    val ym = (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
      .cast("long").as("ym")
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("cust"), ym,
        col("o_totalprice").cast("decimal(18,2)").as("rev"))
    val wCust = Window.partitionBy("cust")
    val cells = o
      .withColumn("cohort_ym", min(col("ym")).over(wCust))
      .withColumn("age", col("ym") - col("cohort_ym"))
      .groupBy("cohort_ym", "age")
      .agg(countDistinct(col("cust")).as("n_active"),
        sum(col("rev")).cast("decimal(18,2)").as("cell_rev"))
    val sizes = cells.filter(col("age") === 0)
      .select(col("cohort_ym"), col("n_active").as("cohort_size"))
    val wCum = Window.partitionBy("cohort_ym").orderBy("age")
    cells.join(sizes, Seq("cohort_ym"))
      .withColumn("cum_rev",
        sum(col("cell_rev")).over(wCum).cast("decimal(18,2)"))
      .select(col("cohort_ym"), col("age"), col("n_active"), col("cohort_size"),
        col("cell_rev").cast("double").as("cell_rev"),
        col("cum_rev").cast("double").as("cum_rev"),
        (floor(col("cum_rev").cast("double") / col("cohort_size")
          * 10000 + lit(0.5)) / 10000.0).as("cum_ltv_per_member"))
      .orderBy("cohort_ym", "age")
  }

  /** Strictly-ordered funnel — users who progressed view → click →
    * purchase in TIME ORDER (q10's funnel counts per-step populations
    * with no ordering constraint; this is the sequenced version every
    * product-analytics engine ships as its funnel primitive). Step k's
    * anchor is the user's first step-k event strictly after their
    * step-(k−1) anchor — the standard first-touch rule.
    *
    * Plan: one narrow per-step aggregation each (user-keyed exchanges
    * AQE co-locates), then three scalar counts cross-joined into the
    * one-row report. The event scan is shared; nothing buffers a user's
    * event list. Timestamps compare at the fixture's native microsecond
    * grain in both engines. */
  def orderedFunnel(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("v_ts"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id")).filter(col("ts") > col("v_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("c_ts"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id")).filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min(col("ts")).as("p_ts"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel")))
  }

  /** q127 — exponentially time-decayed spend per customer (half-life
    * 30 days, bucketed): the recency-weighted activity feature a
    * training pipeline derives from transaction history (decayed counts
    * / sums are the standard freshness features in feature stores).
    *
    * Determinism contract: decay weights are EXACT powers of two —
    * bucket = ⌊days-before-anchor / 30⌋, weight = 0.5^bucket — so the
    * weight is bit-identical in any IEEE engine; per-bucket sums run on
    * exact DECIMAL(18,2) (the q122 rule); each bucket's weighted
    * contribution is one double product rounded to 6dp into
    * DECIMAL(18,6), so the final per-customer sum is order-independent
    * integer arithmetic.
    *
    * Scale: one groupBy (custkey, bucket) with map-side partial agg —
    * the shuffle carries ≤ (customers × ~40 buckets) rows regardless of
    * order count; the anchor (max order date) is a broadcast scalar;
    * top-100 plans as TakeOrderedAndProject. */
  def decayedSpend(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        to_date(col("o_orderdate")).as("od"))
    val anchor = o.agg(max(col("od")).as("anchor"))
    val perBucket = o.crossJoin(broadcast(anchor))
      .withColumn("bucket",
        floor(datediff(col("anchor"), col("od")) / lit(30.0)).cast("long"))
      .groupBy("custkey", "bucket")
      .agg(sum(col("price")).as("bsum"), count(lit(1)).as("n"))
    perBucket
      .withColumn("contrib",
        round(col("bsum").cast("double") * pow(lit(0.5), col("bucket")), 6)
          .cast("decimal(18,6)"))
      .groupBy("custkey")
      .agg(sum(col("contrib")).as("dec_sum"), sum(col("n")).as("n_orders"))
      .orderBy(col("dec_sum").desc, col("custkey"))
      .limit(100)
      .select(col("custkey"), col("n_orders"),
        col("dec_sum").cast("double").as("decayed_spend"))
  }


  /** q155 — conversion-window funnel: the q112 ordered funnel with the
    * product-analytics constraint every real funnel carries — each step
    * must land within 7 DAYS of the previous step's anchor, not just
    * after it. A view-to-purchase journey spread over months is
    * browsing, not conversion; the window is what makes the metric
    * actionable. Anchors are first-touch (min event time), windows are
    * exact microsecond integer arithmetic (the q135/q145 rule).
    *
    * Plan: one narrow user-keyed aggregation per step (AQE co-locates
    * the exchanges), scalar counts cross-joined into the one-row
    * report — the q112 shape with a tighter filter. */
  def windowedFunnel(s: SparkSession, dir: String): DataFrame = {
    val WindowUs = 7L * 86400L * 1000000L
    val ev = t(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("us")).as("v_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, Seq("user_id"))
      .filter(col("us") > col("v_us") && col("us") <= col("v_us") + WindowUs)
      .groupBy("user_id").agg(min(col("us")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, Seq("user_id"))
      .filter(col("us") > col("c_us") && col("us") <= col("c_us") + WindowUs)
      .groupBy("user_id").agg(min(col("us")).as("p_us"))
    v.agg(count(lit(1)).as("n_view"))
      .crossJoin(c.agg(count(lit(1)).as("n_view_click_7d")))
      .crossJoin(p.agg(count(lit(1)).as("n_full_funnel_7d")))
  }

  /** q156 — day-of-week seasonal index of daily revenue per priority:
    * mean revenue on each weekday divided by the priority's overall
    * daily mean. Index 1.1 on Mondays means Mondays run 10% hot — the
    * profile that separates real drift from weekly rhythm in any
    * monitoring baseline. Weekday = days-since-a-known-Monday mod 7
    * (1992-01-06; integer arithmetic — both engines' dayofweek()
    * builtins disagree on week start and are avoided). Sums ride
    * DECIMAL(18,2); each mean and the index are fixed double
    * expression trees of exact components.
    *
    * Plan: one (priority, day) partial-agg exchange; everything after
    * is a 7·|priorities|-row frame. */
  def seasonalIndex(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
      .withColumn("dow",
        pmod(datediff(col("d"), lit("1992-01-06").cast("date")), lit(7)))
    val byDow = daily.groupBy("priority", "dow")
      .agg(count(lit(1)).as("n_days"),
        sum(col("rev")).cast("decimal(18,2)").as("s"))
    val overall = daily.groupBy("priority")
      .agg(count(lit(1)).as("n_all"),
        sum(col("rev")).cast("decimal(18,2)").as("s_all"))
    byDow.join(overall, Seq("priority"))
      .select(col("priority"), col("dow"), col("n_days"),
        round(col("s").cast("double") / col("n_days"), 4).as("mean_rev"),
        round((col("s").cast("double") / col("n_days"))
          / (col("s_all").cast("double") / col("n_all")), 6).as("seasonal_index"))
      .orderBy("priority", "dow")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_price_gapfill" -> priceGapfill,
    "q105_cohort_retention" -> cohortRetention,
    "q112_ordered_funnel" -> orderedFunnel,
    "q127_decayed_spend" -> decayedSpend,
    "q152_ltv_cohorts" -> ltvCohorts,
    "q155_windowed_funnel" -> windowedFunnel,
    "q156_seasonal_index" -> seasonalIndex)

  val oracleSql: Map[String, String] = Map(
    "q155_windowed_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |v AS (SELECT user_id, MIN(us) AS v_us FROM ev
        |      WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT ev.user_id, MIN(us) AS c_us FROM ev JOIN v USING (user_id)
        |      WHERE event_type = 'click' AND us > v_us
        |        AND us <= v_us + 604800000000 GROUP BY 1),
        |p AS (SELECT ev.user_id, MIN(us) AS p_us FROM ev JOIN c USING (user_id)
        |      WHERE event_type = 'purchase' AND us > c_us
        |        AND us <= c_us + 604800000000 GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click_7d,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel_7d""".stripMargin,
    "q156_seasonal_index" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1, 2),
        |dw AS (SELECT priority, rev,
        |    ((CAST(d AS DATE) - DATE '1992-01-06') % 7 + 7) % 7 AS dow
        |  FROM daily),
        |bydow AS (SELECT priority, dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(rev) AS DECIMAL(18,2)) AS s FROM dw GROUP BY 1, 2),
        |overall AS (SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_all,
        |    CAST(SUM(rev) AS DECIMAL(18,2)) AS s_all FROM dw GROUP BY 1)
        |SELECT priority, CAST(dow AS INT) AS dow, n_days,
        |  round(CAST(s AS DOUBLE) / n_days, 4) AS mean_rev,
        |  round((CAST(s AS DOUBLE) / n_days)
        |    / (CAST(s_all AS DOUBLE) / n_all), 6) AS seasonal_index
        |FROM bydow JOIN overall USING (priority)
        |ORDER BY priority, dow""".stripMargin,
    "q152_ltv_cohorts" ->
      """WITH o AS (SELECT o_custkey AS cust,
        |    year(CAST(o_orderdate AS DATE)) * 12
        |      + month(CAST(o_orderdate AS DATE)) - 1 AS ym,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS rev
        |  FROM orders),
        |w AS (SELECT cust, ym, rev,
        |    MIN(ym) OVER (PARTITION BY cust) AS cohort_ym
        |  FROM o),
        |cells AS (SELECT cohort_ym, ym - cohort_ym AS age,
        |    CAST(COUNT(DISTINCT cust) AS BIGINT) AS n_active,
        |    CAST(SUM(rev) AS DECIMAL(18,2)) AS cell_rev
        |  FROM w GROUP BY 1, 2),
        |sizes AS (SELECT cohort_ym, n_active AS cohort_size
        |          FROM cells WHERE age = 0),
        |cum AS (SELECT c.cohort_ym, c.age, c.n_active, s.cohort_size,
        |    c.cell_rev,
        |    CAST(SUM(c.cell_rev) OVER (PARTITION BY c.cohort_ym ORDER BY c.age)
        |      AS DECIMAL(18,2)) AS cum_rev
        |  FROM cells c JOIN sizes s USING (cohort_ym))
        |SELECT cohort_ym, age, n_active, cohort_size,
        |  CAST(cell_rev AS DOUBLE) AS cell_rev,
        |  CAST(cum_rev AS DOUBLE) AS cum_rev,
        |  floor(CAST(cum_rev AS DOUBLE) / cohort_size * 10000
        |    + CAST(0.5 AS DOUBLE)) / 10000.0 AS cum_ltv_per_member
        |FROM cum ORDER BY cohort_ym, age""".stripMargin,
    "q127_decayed_spend" ->
      """WITH o AS (SELECT o_custkey AS custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |    CAST(o_orderdate AS DATE) AS od
        |  FROM orders),
        |a AS (SELECT MAX(od) AS anchor FROM o),
        |b AS (SELECT custkey, price,
        |    CAST(floor(date_diff('day', od, anchor) / 30.0) AS BIGINT) AS bucket
        |  FROM o CROSS JOIN a),
        |pb AS (SELECT custkey, bucket, SUM(price) AS bsum,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM b GROUP BY 1, 2),
        |c AS (SELECT custkey,
        |    CAST(round(CAST(bsum AS DOUBLE) * pow(0.5, bucket), 6)
        |      AS DECIMAL(18,6)) AS contrib, n
        |  FROM pb),
        |g AS (SELECT custkey, SUM(contrib) AS dec_sum,
        |    CAST(SUM(n) AS BIGINT) AS n_orders
        |  FROM c GROUP BY 1)
        |SELECT custkey, n_orders, CAST(dec_sum AS DOUBLE) AS decayed_spend
        |FROM g ORDER BY dec_sum DESC, custkey LIMIT 100""".stripMargin,
    "q112_ordered_funnel" ->
      """WITH v AS (SELECT user_id, MIN(ts) AS v_ts FROM events
        |           WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ts) AS c_ts
        |      FROM events e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ts > v.v_ts GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ts) AS p_ts
        |      FROM events e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_view_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_full_funnel""".stripMargin,
    "q104_price_gapfill" ->
      """WITH obs AS (SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS day,
        |    round(MIN(l_extendedprice), 2) AS obs_price
        |  FROM lineitem WHERE l_partkey <= 50 GROUP BY 1, 2),
        |span AS (SELECT part, MIN(day) AS d0, MAX(day) AS d1 FROM obs GROUP BY 1),
        |grid AS (SELECT part,
        |    CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
        |      CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
        |  FROM span),
        |j AS (SELECT g.part, g.day, o.obs_price
        |      FROM grid g LEFT JOIN obs o USING (part, day)),
        |c AS (SELECT *, COUNT(obs_price) OVER
        |    (PARTITION BY part ORDER BY day) AS grp FROM j)
        |SELECT part, day, obs_price,
        |  MAX(obs_price) OVER (PARTITION BY part, grp) AS price_filled,
        |  obs_price IS NULL AS is_filled
        |FROM c ORDER BY part, day""".stripMargin,
    "q105_cohort_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |    CAST(floor(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) / 7.0)
        |      AS BIGINT) AS week
        |  FROM events),
        |c AS (SELECT user_id, week,
        |    MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM uw),
        |cells AS (SELECT cohort_week, week - cohort_week AS week_offset,
        |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM c GROUP BY 1, 2),
        |sizes AS (SELECT cohort_week, n_users AS cohort_size
        |          FROM cells WHERE week_offset = 0)
        |SELECT cells.cohort_week, cells.week_offset, cells.n_users,
        |  sizes.cohort_size,
        |  round(CAST(cells.n_users AS DOUBLE) / sizes.cohort_size, 4) AS retention
        |FROM cells JOIN sizes USING (cohort_week)
        |ORDER BY cells.cohort_week, cells.week_offset""".stripMargin)
}
