package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables.t

/** Statistical profiling operators: per-group ordinary least squares
  * (trend extraction), per-group correlation/covariance, and the
  * first-order Markov transition matrix over the event stream — the
  * three "is this signal real" reports an analyst runs after the
  * descriptive aggregates (q01–q24) and before any modeling.
  *
  * Float posture: every statistic here is an algebraic function of
  * pairwise-mergeable moments (Σx, Σy, Σxy, Σx², n) that BOTH engines
  * compute with numerically-stable centered updates (`regr_*`, `corr`,
  * `covar_pop` are ANSI aggregates in Spark and DuckDB alike); results
  * are rounded before comparison so the last-ulp difference from
  * different merge orders cannot flip the hash. Counts stay exact
  * integers throughout.
  */
object StatOps {

  /** q136 — per-brand OLS price trend: slope / intercept / r² of the
    * daily average extended price against the day index, via the ANSI
    * `regr_slope`/`regr_intercept`/`regr_r2` aggregates (one pass,
    * mergeable moment state — the distributed-safe form; an explicit
    * n·Σxy − ΣxΣy assembly would cancel catastrophically at corpus
    * sums this size).
    *
    * Plan: fact⋈part is a broadcast join (part is dim-sized), the
    * (brand, day) pre-aggregation collapses lineitem map-side before
    * the only corpus-keyed exchange, and the regression itself runs on
    * |brands|·|days| rows — bounded by the calendar, not the fact
    * count, so the shape survives any fact-table scale-up unchanged. */
  def priceTrend(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "lineitem")
      .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01").cast("date"))
          .cast("double").as("x"),
        col("l_extendedprice"))
      .groupBy(col("p_brand"), col("x"))
      // DECIMAL-sum / count avg, not avg(): a double-sum mean is
      // partial-merge-order dependent, so the regression inputs would
      // differ in ulps between Spark and the single-threaded oracle.
      // This form is bit-identical in both engines; the residual risk
      // is only the regr_* moment merges (seeded differential gate).
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        / count(lit(1))).as("y"))
    daily.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_days"),
        round(regr_slope(col("y"), col("x")), 6).as("slope"),
        round(regr_intercept(col("y"), col("x")), 4).as("intercept"),
        round(regr_r2(col("y"), col("x")), 6).as("r2"))
      .orderBy(col("p_brand"))
  }

  /** q137 — first-order Markov transition matrix over the event
    * stream: for every (event_type → next event_type) step inside a
    * user's timeline, the step count and the row-normalized transition
    * probability. The "what happens after a click" report, and the
    * input to any sequential model of user behavior.
    *
    * Ordering is (ts, event_id) — the event id breaks timestamp ties
    * deterministically, so the lead() is a pure function of the table.
    * Plan: one exchange on user_id (the partitioning every sessionize/
    * funnel query already uses) for the lead window, then a
    * |types|²-row aggregate; the probability window runs on that tiny
    * frame. Event-type cardinality bounds the output, not the corpus. */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val steps = t(s, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    steps
      .withColumn("p", round(col("n").cast("double")
        / sum(col("n")).over(Window.partitionBy("from_type")), 6))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** q138 — per-group second-moment profile of the lineitem measures:
    * Pearson correlations, population covariance, and the price
    * standard deviation per return flag. Correlation near 0 between
    * quantity and price is the expected signature of independently
    * drawn synthetic measures — the point of the report is that the
    * VALUE is checked against an independent engine, not assumed.
    *
    * Plan: one partial-aggregated pass over lineitem (moment state is
    * a dozen doubles per group, merged map-side); output rows =
    * |return flags|. Nothing here grows with the fact table. */
  def measureCorr(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        // Composed corr = covar_pop / (sd·sd) — but through try_divide,
        // so a zero-variance group (constant measures: a mirrored or
        // stuck producer) yields NULL like DuckDB/Postgres corr,
        // instead of the built-in Corr's unguarded ANSI
        // DIVIDE_BY_ZERO. The denominator stddevs are computed over
        // the PAIRWISE-COMPLETE row set (x masked where y is null and
        // vice versa): covar_pop only sees rows where both sides are
        // non-null, so a bare stddev_pop(x) — which would include
        // x-rows whose y is null — is a DIFFERENT moment state the
        // instant nulls are asymmetric, diverging from both engines'
        // built-in corr (NullInputSpec synthesizes exactly that).
        round(try_divide(
          covar_pop(col("l_quantity"), col("l_extendedprice")),
          stddev_pop(when(col("l_extendedprice").isNotNull, col("l_quantity")))
            * stddev_pop(when(col("l_quantity").isNotNull,
                col("l_extendedprice")))), 6)
          .as("corr_qty_price"),
        round(try_divide(
          covar_pop(col("l_extendedprice"), col("l_discount")),
          stddev_pop(when(col("l_discount").isNotNull, col("l_extendedprice")))
            * stddev_pop(when(col("l_extendedprice").isNotNull,
                col("l_discount")))), 6)
          .as("corr_price_disc"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4)
          .as("covar_qty_price"),
        round(stddev_pop(col("l_extendedprice")), 4).as("sd_price"))
      .orderBy(col("l_returnflag"))

  /** q141 — lag-1 / lag-7 autocorrelation of the daily revenue series
    * per order priority: "is tomorrow like today, and is next week like
    * this week" — the seasonality probe an analyst runs before fitting
    * any forecast. The lag is over OBSERVED days (row lag within the
    * date-ordered series), the convention both engines implement
    * identically; `corr` drops rows whose lag is NULL (series head) in
    * both engines, so no explicit null filter is needed.
    *
    * Plan: one exchange builds the (priority, day) daily frame (partial
    * sums map-side); the lag window and the corr aggregate both run on
    * that calendar-bounded frame — |priorities|·|days| rows regardless
    * of fact-table scale. */
  def revenueAcf(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice")).as("y"))
    val w = Window.partitionBy("priority").orderBy("d")
    daily
      .withColumn("y1", lag(col("y"), 1).over(w))
      .withColumn("y7", lag(col("y"), 7).over(w))
      .groupBy(col("priority"))
      .agg(count(lit(1)).as("n_days"),
        round(corr(col("y"), col("y1")), 6).as("acf1"),
        round(corr(col("y"), col("y7")), 6).as("acf7"))
      .orderBy("priority")
  }

  /** q144 — Benford first-digit profile of the extended price: observed
    * share of each leading significant digit vs the Benford expectation
    * log10(1 + 1/d). A classic data-quality screen for fabricated or
    * truncated numeric columns. The digit is extracted through EXACT
    * integer arithmetic on cents (round→bigint→string head), never
    * through floor(log10(x)) whose last-ulp wobble near powers of ten
    * would let the two engines bucket a boundary price differently.
    *
    * Plan: per-row digit, one 9-row aggregate; counts partial map-side. */
  def benfordPrices(s: SparkSession, dir: String): DataFrame = {
    // Materialized (the q109 rule): the total and the final projection
    // both consume this 9-row frame — unmaterialized, each re-scans
    // the fact table.
    val counts = graft.Materialize.stable(t(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(round(col("l_extendedprice") * 100)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n")))
    val tot = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        round(col("n").cast("double") / col("total"), 6).as("share"),
        round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6).as("expected"),
        round(col("n").cast("double") / col("total")
          - log(10.0, lit(1.0) + lit(1.0) / col("digit")), 6).as("delta"))
      .orderBy("digit")
  }

  /** q145 — inter-arrival gap profile per event type: for consecutive
    * events of the same type inside one user's timeline, the count,
    * mean, deviation and maximum of the gap. The report that separates
    * heartbeat-shaped types (tight, regular gaps) from organic ones,
    * and the empirical input to any session-timeout choice (q47/q61).
    * Gaps are exact microsecond integers end-to-end (the q135 rule:
    * per-event epoch-us truncation, identical in both engines); floats
    * appear only in the final rounded moments.
    *
    * Plan: one exchange on (user_id, event_type) for the lag window —
    * then a |types|-row aggregate with map-side partials. */
  def eventGapProfile(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type")
      .orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap_us").isNotNull)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"),
        round(avg(col("gap_us")) / 1000000.0, 4).as("avg_gap_s"),
        round(stddev_pop(col("gap_us")) / 1000000.0, 4).as("sd_gap_s"),
        round(max(col("gap_us")) / 1000000.0, 4).as("max_gap_s"))
      .orderBy("event_type")
  }

  /** q148 — top 3-step event paths: the most frequent consecutive
    * (type → type → type) sequences inside user timelines, top-20. The
    * q137 transition matrix generalized one step further — the report
    * behind "what journey do users actually take". Ordering and
    * tie-breaks follow the q137/q145 contract: (epoch-us, event_id)
    * within user, count-desc then path-asc on the ranking.
    *
    * Plan: ONE exchange on user_id feeds both lead() columns (same
    * window frame), the path aggregate is map-side partial, and top-20
    * plans as TakeOrderedAndProject — nothing downstream of the window
    * scales with the corpus. */
  def topPaths(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
    t(s, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("us"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t3").isNotNull)
      .select(concat_ws(">", col("event_type"), col("t2"), col("t3")).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(20)
  }

  /** q150 — winsorized daily-revenue statistics per order priority:
    * clamp the daily series at its empirical p5/p95 and report the
    * robust mean next to the raw one (plus the clip count). The outlier
    * -robust location estimate an anomaly monitor baselines against —
    * one promotion day no longer drags the "typical day" number.
    *
    * Determinism: daily sums ride DECIMAL(18,2) (order-independent);
    * the percentile boundary is percent_rank = (rank−1)/(n−1), an exact
    * small-integer ratio both engines compare identically (never an
    * interpolating percentile function, whose interpolation rules
    * differ); means go through exact DECIMAL sums cast to double (the
    * q01 money rule).
    *
    * Plan: the fact-sized work is one (priority, day) partial-agg
    * exchange; the rank window and clip run on the calendar-bounded
    * daily frame (the q141 posture), so nothing downstream scales with
    * the fact table. */
  def winsorizedDaily(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
    val wp = Window.partitionBy("priority").orderBy("rev")
    val pr = daily.withColumn("pr", percent_rank().over(wp))
    val bounds = pr.groupBy("priority")
      .agg(max(when(col("pr") <= 0.05, col("rev"))).as("lo"),
        min(when(col("pr") >= 0.95, col("rev"))).as("hi"))
    pr.join(bounds, Seq("priority"))
      .withColumn("clipped", least(greatest(col("rev"), col("lo")), col("hi")))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_days"),
        max(col("lo")).cast("double").as("p05"),
        max(col("hi")).cast("double").as("p95"),
        sum(when(col("rev") < col("lo") || col("rev") > col("hi"), 1L)
          .otherwise(0L)).as("n_clipped"),
        round(sum(col("rev")).cast("double") / count(lit(1)), 4).as("raw_mean"),
        round(sum(col("clipped")).cast("double") / count(lit(1)), 4)
          .as("winsorized_mean"))
      .orderBy("priority")
  }


  /** q157 — CUSUM change-point estimate per order priority: the running
    * cumulative sum of (daily revenue − overall mean) peaks in absolute
    * value at the most likely mean-shift point (Page 1954; the classic
    * offline CUSUM estimator). The monitoring primitive that turns
    * "revenue looks different lately" into a specific date.
    *
    * Determinism: the mean is quantized to DECIMAL(18,2) by the
    * midpoint rule BEFORE differencing, so every deviation and the
    * running sum are exact DECIMAL arithmetic — order-independent and
    * hash-stable; the argmax tie-breaks on the earlier day.
    *
    * Plan: one (priority, day) partial-agg exchange; mean is a
    * broadcast |priorities|-row frame; the running window and argmax
    * rank run on the calendar-bounded daily frame. */
  def cusumChangepoint(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(col("o_orderpriority").as("priority"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("rev"))
    val means = daily.groupBy("priority")
      .agg((floor(sum(col("rev")).cast("double") / count(lit(1)) * 100
        + lit(0.5)) / 100.0).cast("decimal(18,2)").as("mu"),
        count(lit(1)).as("n_days"))
    val wRun = Window.partitionBy("priority").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cusum = daily.join(means, Seq("priority"))
      .withColumn("cusum",
        sum((col("rev") - col("mu")).cast("decimal(18,2)")).over(wRun)
          .cast("decimal(18,2)"))
    val wRank = Window.partitionBy("priority")
      .orderBy(abs(col("cusum")).desc, col("d"))
    cusum.withColumn("rk", row_number().over(wRank))
      .filter(col("rk") === 1)
      .select(col("priority"), col("n_days"),
        col("d").as("changepoint_day"),
        col("cusum").cast("double").as("peak_cusum"),
        col("mu").cast("double").as("mean_daily_rev"))
      .orderBy("priority")
  }

  /** q158 — daily event-type entropy: Shannon entropy (nats) of the
    * event-type distribution per day, with the day's volume. A mixture
    * drift monitor: a traffic mix that suddenly collapses toward one
    * type (bot burst, instrumentation break) shows up as an entropy
    * drop before any single count alarms.
    *
    * Determinism: the ≤|types| probability terms are exact integer
    * ratios; the entropy sum accumulates over a SORTED list (the q82
    * ordered-sum rule) so both engines add the same IEEE terms in the
    * same order; rounded to 6dp.
    *
    * Plan: one (day, type) partial-agg exchange, then a per-day
    * aggregate over ≤|types| rows. */
  def dailyTypeEntropy(s: SparkSession, dir: String): DataFrame = {
    val counts = t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val byDay = counts.groupBy("d")
      .agg(sum(col("n")).as("n_events"),
        count(lit(1)).as("n_types"),
        sort_array(collect_list(col("n"))).as("ns"))
    byDay.select(col("d"), col("n_events"), col("n_types"),
        round(aggregate(col("ns"), lit(0.0), (acc, n) =>
          acc - (n.cast("double") / col("n_events"))
            * log(n.cast("double") / col("n_events"))), 6).as("entropy_nats"))
      .orderBy("d")
  }


  /** q166 — Gini coefficient of customer spend per nation: the
    * inequality index G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n over the
    * rank-ordered per-customer totals. The market-concentration
    * screen — a nation whose revenue Gini approaches 1 is a
    * one-whale market and every per-nation average is misleading.
    *
    * Determinism: spend totals ride DECIMAL(18,2); ranks are total
    * under (spend, custkey) — no tie ambiguity; Σ i·xᵢ accumulates in
    * DECIMAL (exact rank-weighted cents); the final G is one double
    * expression of exact sums, rounded 6dp.
    *
    * Plan: one (nation, customer) partial-agg exchange; the rank comes
    * from `Prefix.groupedRank` on the exact cents key (a per-nation
    * rank WINDOW would sort |customers|/25 rows in one task — the
    * PlanAuditSpec class); the Gini arithmetic runs on |nations| rows. */
  def spendGini(s: SparkSession, dir: String): DataFrame = {
    val spend = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey").cast("long").as("nation"), col("c_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)").as("spend"))
    graft.ops.Prefix.groupedRank(
        spend.withColumn("__k", (col("spend") * 100).cast("long")),
        Seq("nation"), "__k", "c_custkey", "rk")
      .groupBy("nation")
      .agg(count(lit(1)).as("n_customers"),
        sum(col("spend")).cast("decimal(18,2)").as("total_spend"),
        sum(col("spend") * col("rk")).cast("decimal(28,2)").as("rank_weighted"))
      .select(col("nation"), col("n_customers"),
        col("total_spend").cast("double").as("total_spend"),
        round(lit(2.0) * col("rank_weighted").cast("double")
          / (col("n_customers") * col("total_spend").cast("double"))
          - (col("n_customers") + 1).cast("double") / col("n_customers"), 6)
          .as("gini"))
      .orderBy("nation")
  }

  /** q167 — effective source count per language (inverse Simpson
    * index 1/Σ shareᵢ²): how many sources a language's corpus
    * EFFECTIVELY draws from once concentration is priced in — 20
    * sources at 5% each scores 20, one dominant source scores ≈1. The
    * diversity number a mixture review reads next to q82's weights.
    *
    * Determinism: Σ share² accumulates over a SORTED list (the q82
    * rule); everything upstream is exact integer counts.
    *
    * Plan: one (lang, source) aggregate, then |langs|-row arithmetic. */
  def sourceDiversity(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "documents")
      .groupBy(col("lang"), col("source")).agg(count(lit(1)).as("n"))
    c.groupBy("lang")
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_sources"),
        sort_array(collect_list(col("n"))).as("ns"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        round(lit(1.0) / aggregate(col("ns"), lit(0.0), (acc, x) =>
          acc + (x.cast("double") / col("n_docs"))
            * (x.cast("double") / col("n_docs"))), 4).as("effective_sources"))
      .orderBy("lang")
  }


  /** q168 — fulfillment lead-time profile per priority: days between
    * order date and each line's ship date — count, mean, deviation,
    * max. The operations metric behind every SLA conversation; exact
    * integer day arithmetic until the final rounded moments (the q145
    * posture on the warehouse side).
    *
    * Plan: the fact⋈orders join shuffles on the order key both tables
    * already share (S7 bucketing makes it co-located at scale); the
    * rollup is |priorities| rows with map-side partials. */
  def leadTimeProfile(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"),
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate")))
          .cast("long").as("lead_days"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_lines"),
        round(avg(col("lead_days")), 4).as("avg_days"),
        round(stddev_pop(col("lead_days")), 4).as("sd_days"),
        max(col("lead_days")).as("max_days"))
      .orderBy("priority")

  /** q169 — tokenizer fertility per language: characters per
    * whitespace token, Σchars/Σtokens as ONE exact-integer ratio. THE
    * multilingual-fairness number — a language whose text yields
    * systematically fewer characters per token gets more tokens per
    * unit content, pays more compute per document, and is
    * under-weighted by any token-denominated budget (q143) unless
    * corrected. Per-row, one |langs|-row aggregate. */
  def tokenizerFertility(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("lang"), col("n_chars"),
        size(graft.functions.Tokenize.tokens(col("text"))).cast("long").as("toks"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        sum(col("toks")).as("total_tokens"))
      .withColumn("chars_per_token",
        round(col("total_chars").cast("double") / col("total_tokens"), 4))
      .orderBy("lang")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q168_lead_time_profile" -> leadTimeProfile,
    "q169_tokenizer_fertility" -> tokenizerFertility,
    "q166_spend_gini" -> spendGini,
    "q167_source_diversity" -> sourceDiversity,
    "q136_price_trend"      -> priceTrend,
    "q137_event_transitions" -> eventTransitions,
    "q138_measure_corr"     -> measureCorr,
    "q141_revenue_acf"      -> revenueAcf,
    "q144_benford_prices"   -> benfordPrices,
    "q145_event_gap_profile" -> eventGapProfile,
    "q148_top_paths"        -> topPaths,
    "q150_winsorized_daily" -> winsorizedDaily,
    "q157_cusum_changepoint" -> cusumChangepoint,
    "q158_daily_type_entropy" -> dailyTypeEntropy)

  val oracleSql: Map[String, String] = Map(
    "q168_lead_time_profile" ->
      """WITH lt AS (SELECT o_orderpriority AS priority,
        |    CAST(date_diff('day', CAST(o_orderdate AS DATE),
        |      CAST(l_shipdate AS DATE)) AS BIGINT) AS lead_days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  round(AVG(lead_days), 4) AS avg_days,
        |  round(stddev_pop(lead_days), 4) AS sd_days,
        |  MAX(lead_days) AS max_days
        |FROM lt GROUP BY priority ORDER BY priority""".stripMargin,
    "q169_tokenizer_fertility" ->
      """SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
        |  CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |    AS BIGINT) AS total_tokens,
        |  round(CAST(SUM(n_chars) AS DOUBLE)
        |    / CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> '')))
        |        AS BIGINT), 4) AS chars_per_token
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q166_spend_gini" ->
      """WITH spend AS (SELECT CAST(c_nationkey AS BIGINT) AS nation, c_custkey,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT nation, spend,
        |    CAST(row_number() OVER (PARTITION BY nation
        |      ORDER BY spend, c_custkey) AS BIGINT) AS rk
        |  FROM spend),
        |agg AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |    CAST(SUM(spend) AS DECIMAL(18,2)) AS total_spend,
        |    CAST(SUM(spend * rk) AS DECIMAL(28,2)) AS rank_weighted
        |  FROM rk GROUP BY 1)
        |SELECT nation, n_customers,
        |  CAST(total_spend AS DOUBLE) AS total_spend,
        |  round(2.0 * CAST(rank_weighted AS DOUBLE)
        |    / (n_customers * CAST(total_spend AS DOUBLE))
        |    - CAST(n_customers + 1 AS DOUBLE) / n_customers, 6) AS gini
        |FROM agg ORDER BY nation""".stripMargin,
    "q167_source_diversity" ->
      """WITH c AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY 1, 2),
        |g AS (SELECT lang, CAST(SUM(n) AS BIGINT) AS n_docs,
        |    CAST(COUNT(*) AS BIGINT) AS n_sources,
        |    list(n ORDER BY n) AS ns
        |  FROM c GROUP BY 1)
        |SELECT lang, n_docs, n_sources,
        |  round(CAST(1 AS DOUBLE) / list_sum(list_transform(ns, x ->
        |    (CAST(x AS DOUBLE) / n_docs) * (CAST(x AS DOUBLE) / n_docs))), 4)
        |    AS effective_sources
        |FROM g ORDER BY lang""".stripMargin,

    "q157_cusum_changepoint" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1, 2),
        |m AS (SELECT priority,
        |    CAST(floor(CAST(SUM(rev) AS DOUBLE) / COUNT(*) * 100
        |      + CAST(0.5 AS DOUBLE)) / 100.0 AS DECIMAL(18,2)) AS mu,
        |    CAST(COUNT(*) AS BIGINT) AS n_days
        |  FROM daily GROUP BY 1),
        |c AS (SELECT daily.priority, d, n_days, mu,
        |    CAST(SUM(CAST(rev - mu AS DECIMAL(18,2))) OVER (
        |      PARTITION BY daily.priority ORDER BY d
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(18,2)) AS cusum
        |  FROM daily JOIN m ON m.priority = daily.priority),
        |r AS (SELECT *, row_number() OVER (PARTITION BY priority
        |        ORDER BY abs(cusum) DESC, d) AS rk FROM c)
        |SELECT priority, n_days, d AS changepoint_day,
        |  CAST(cusum AS DOUBLE) AS peak_cusum,
        |  CAST(mu AS DOUBLE) AS mean_daily_rev
        |FROM r WHERE rk = 1 ORDER BY priority""".stripMargin,
    "q158_daily_type_entropy" ->
      """WITH c AS (SELECT CAST(ts AS DATE) AS d, event_type,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |byday AS (SELECT d, CAST(SUM(n) AS BIGINT) AS n_events,
        |    CAST(COUNT(*) AS BIGINT) AS n_types,
        |    list(n ORDER BY n) AS ns
        |  FROM c GROUP BY 1)
        |SELECT d, n_events, n_types,
        |  round(list_sum(list_transform(ns, n ->
        |    -(CAST(n AS DOUBLE) / n_events) * ln(CAST(n AS DOUBLE) / n_events))),
        |    6) AS entropy_nats
        |FROM byday ORDER BY d""".stripMargin,
    "q150_winsorized_daily" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS d,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS rev
        |  FROM orders GROUP BY 1, 2),
        |pr AS (SELECT priority, rev,
        |    percent_rank() OVER (PARTITION BY priority ORDER BY rev) AS pr
        |  FROM daily),
        |b AS (SELECT priority,
        |    MAX(CASE WHEN pr <= 0.05 THEN rev END) AS lo,
        |    MIN(CASE WHEN pr >= 0.95 THEN rev END) AS hi
        |  FROM pr GROUP BY 1),
        |c AS (SELECT pr.priority, rev, lo, hi,
        |    least(greatest(rev, lo), hi) AS clipped
        |  FROM pr JOIN b ON b.priority = pr.priority)
        |SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  CAST(MAX(lo) AS DOUBLE) AS p05,
        |  CAST(MAX(hi) AS DOUBLE) AS p95,
        |  CAST(SUM(CASE WHEN rev < lo OR rev > hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_clipped,
        |  round(CAST(SUM(rev) AS DOUBLE) / COUNT(*), 4) AS raw_mean,
        |  round(CAST(SUM(clipped) AS DOUBLE) / COUNT(*), 4) AS winsorized_mean
        |FROM c GROUP BY priority ORDER BY priority""".stripMargin,
    "q148_top_paths" ->
      """WITH s AS (SELECT event_type AS t1,
        |    LEAD(event_type, 1) OVER w AS t2,
        |    LEAD(event_type, 2) OVER w AS t3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT t1 || '>' || t2 || '>' || t3 AS path,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM s WHERE t3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 20""".stripMargin,
    "q141_revenue_acf" ->
      """WITH daily AS (SELECT o_orderpriority AS priority,
        |    CAST(o_orderdate AS DATE) AS d, SUM(o_totalprice) AS y
        |  FROM orders GROUP BY 1, 2),
        |lagged AS (SELECT priority, y,
        |    LAG(y, 1) OVER (PARTITION BY priority ORDER BY d) AS y1,
        |    LAG(y, 7) OVER (PARTITION BY priority ORDER BY d) AS y7
        |  FROM daily)
        |SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  round(corr(y, y1), 6) AS acf1,
        |  round(corr(y, y7), 6) AS acf7
        |FROM lagged GROUP BY priority ORDER BY priority""".stripMargin,
    "q144_benford_prices" ->
      """WITH c AS (
        |  SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      AS VARCHAR), 1, 1) AS INT) AS digit,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1),
        |t AS (SELECT SUM(n) AS total FROM c)
        |SELECT digit, n,
        |  round(CAST(n AS DOUBLE) / total, 6) AS share,
        |  round(log10(1.0 + 1.0 / digit), 6) AS expected,
        |  round(CAST(n AS DOUBLE) / total - log10(1.0 + 1.0 / digit), 6) AS delta
        |FROM c, t ORDER BY digit""".stripMargin,
    "q145_event_gap_profile" ->
      """WITH g AS (SELECT event_type,
        |    epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
        |      PARTITION BY user_id, event_type
        |      ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
        |  round(AVG(gap_us) / 1000000.0, 4) AS avg_gap_s,
        |  round(stddev_pop(gap_us) / 1000000.0, 4) AS sd_gap_s,
        |  round(MAX(gap_us) / 1000000.0, 4) AS max_gap_s
        |FROM g WHERE gap_us IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q136_price_trend" ->
      """WITH daily AS (SELECT p_brand,
        |    CAST(date_diff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS DOUBLE) AS x,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_days,
        |  round(regr_slope(y, x), 6) AS slope,
        |  round(regr_intercept(y, x), 4) AS intercept,
        |  round(regr_r2(y, x), 6) AS r2
        |FROM daily GROUP BY p_brand ORDER BY p_brand""".stripMargin,
    "q137_event_transitions" ->
      """WITH s AS (SELECT event_type AS from_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY epoch_us(ts), event_id) AS to_type
        |  FROM events),
        |g AS (SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM s WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type), 6) AS p
        |FROM g ORDER BY from_type, to_type""".stripMargin,
    "q138_measure_corr" ->
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
        |  round(corr(l_extendedprice, l_discount), 6) AS corr_price_disc,
        |  round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
        |  round(stddev_pop(l_extendedprice), 4) AS sd_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
}
