package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables.t

/** Window-function operators (ranking, running totals, lead/lag).
  *
  * Absent from the reference (SURVEY.md §2.5) but core engine surface.
  * Every window ORDER BY ends in a unique key so frames and ranks are
  * total-ordered — both for oracle determinism and because non-unique
  * RANGE frames are a correctness trap at scale. A window shuffles once
  * on its partition keys; chained windows below share the same
  * partitioning so Catalyst plans a single exchange.
  */
object WindowQueries {

  /** row_number / rank / dense_rank: top-3 orders per customer by price.
    * The per-partition top-k pattern — at 100 TB this is one shuffle on
    * o_custkey, no global sort. */
  def orderRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      // long casts align with DuckDB's int64 window-function outputs so
      // the driver's schema comparison cannot trip on int32 vs int64
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("rk", rank().over(w).cast("long"))
      .withColumn("drk", dense_rank().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy("o_custkey", "rn")
  }

  /** Running total per customer ordered by (date, key). The unique sort
    * key makes the default RANGE frame equal a ROWS frame, and the
    * sequential accumulation stays on the cents grid so round(…,2) is
    * oracle-safe. */
  def runningSpend(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** lead/lag: month-over-month average-price momentum per brand.
    * The monthly average uses the exact-DECIMAL-sum trick (see
    * CoreQueries) so both engines produce bit-identical doubles, making
    * the lag/delta columns comparable without rounding. */
  def priceMomentum(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
    val p  = t(s, dir, "part")
    val monthly = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(
        col("p_brand").as("brand"),
        year(col("l_shipdate")).as("year"),
        month(col("l_shipdate")).as("month"))
      .agg((sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
        / count(lit(1))).as("avg_price"))
    val w = Window.partitionBy(col("brand")).orderBy(col("year"), col("month"))
    monthly
      .withColumn("prev_price", lag(col("avg_price"), 1).over(w))
      .withColumn("delta", col("avg_price") - col("prev_price"))
      .orderBy("brand", "year", "month")
  }

  /** ntile + percent_rank: quartile customers by account balance inside
    * each nation (ties broken by key for determinism).
    *
    * NOT a sort window: `partitionBy(c_nationkey)` over the customer
    * table sorts each nation's ENTIRE customer list (|C|/25 rows) in one
    * task — the low-cardinality-window class PlanAuditSpec pins. The
    * rank instead comes from `Prefix.groupedRank` (cents-keyed balance
    * histogram + tie scan, every task block-bounded), and ntile/
    * percent_rank are integer arithmetic on (rank, n): the order keys
    * are unique per row, so rank() ≡ row_number() and both formulas are
    * exact. */
  def balanceQuartiles(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer")
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"))
      .withColumn("__k", floor(col("c_acctbal") * 100 + lit(0.5)).cast("long"))
    val n = base.groupBy("c_nationkey").agg(count(lit(1)).as("__n"))
    graft.ops.Prefix
      .groupedRank(base, Seq("c_nationkey"), "__k", "c_custkey", "__r")
      .join(broadcast(n), Seq("c_nationkey"))
      .withColumn("quartile", graft.ops.Prefix.ntileOf(col("__r"), col("__n"), 4))
      .withColumn("pct_rank",
        when(col("__n") === 1, lit(0.0))
          .otherwise((col("__r") - 1).cast("double") / (col("__n") - 1)))
      .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
        col("quartile"), col("pct_rank"))
      .orderBy("c_nationkey", "c_acctbal", "c_custkey")
  }

  /** Trailing 7-day revenue — the RANGE-frame window (an interval of the
    * ORDER key, not a row count) the catalog lacked: days with no orders
    * leave real gaps, so a rows-frame would silently span them. The
    * frame key is the integer day number (datediff from the TPC-H
    * epoch), making the range arithmetic engine-portable. All window
    * sums run on exact DECIMAL(18,2) — order-independent, so the
    * segment-tree evaluation DuckDB uses and Spark's streaming frame
    * agree bit-for-bit — and convert to double only on output (the
    * CoreQueries money rule). */
  def rollingRevenue(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"))
      .withColumn("day_num",
        datediff(col("day"), lit("1992-01-01").cast("date")).cast("long"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("rev7_dec", sum(col("rev_dec")).over(w))
      .withColumn("orders_7d", sum(col("n_orders")).over(w))
      .select(col("day"), col("n_orders"),
        col("rev_dec").cast("double").as("revenue"),
        col("rev7_dec").cast("double").as("revenue_7d"),
        col("orders_7d"))
      .orderBy("day")
  }

  /** Percent-of-total contribution — each nation's revenue share within
    * its region via a partition-total window (no self-join, no second
    * aggregation): the (region, nation) rollup is exchanged once on the
    * region key and the total rides the same partitioning. Sums stay
    * DECIMAL until the ratio, which divides two exactly-converted
    * doubles — identical IEEE operation in both engines, left
    * unrounded. */
  def revenueShare(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev_dec"))
    val w = Window.partitionBy("region")
    rev
      .withColumn("region_dec", sum(col("rev_dec")).over(w))
      .select(col("region"), col("nation"),
        col("rev_dec").cast("double").as("revenue"),
        col("region_dec").cast("double").as("region_revenue"),
        (col("rev_dec").cast("double") / col("region_dec").cast("double"))
          .as("share"))
      .orderBy("region", "nation")
  }

  /** q131 — RFM segmentation: the recency/frequency/monetary quintile
    * code marketing marts attach to every customer (Hughes' RFM). Each
    * dimension quintiles WITHIN the customer's nation, ties broken by
    * key. Recency is integer days before the corpus anchor (max order
    * date); monetary sums on exact DECIMAL(18,2) and converts to
    * double only on output.
    *
    * The per-nation frame is customer-scaled, so a
    * `partitionBy(nationkey)` ntile window would sort |C|/25 rows per
    * task (the PlanAuditSpec class). Each dimension's quintile instead
    * rides `Prefix.groupedRank` — descending dimensions negate their
    * integral key (frequency; monetary in exact cents off the
    * DECIMAL(18,2) sum) — and `Prefix.ntileOf` reproduces NTILE(5)'s
    * remainder rule exactly.
    *
    * Plan: one (custkey) aggregation of orders, one broadcast-joined
    * customer dimension, ONE melted block-bounded rank scan over all
    * three dimensions (3|C| rows, groups = nation × dim), one pivot
    * aggregation, one custkey join. */
  def rfmSegments(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("custkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"),
        to_date(col("o_orderdate")).as("od"))
    val anchor = o.agg(max(col("od")).as("anchor"))
    val per = o.groupBy("custkey")
      .agg(max(col("od")).as("last_od"),
        count(lit(1)).as("frequency"),
        sum(col("price")).as("mon_dec"))
      .crossJoin(broadcast(anchor))
      .withColumn("recency_days",
        datediff(col("anchor"), col("last_od")).cast("long"))
    // MATERIALIZED (the q109 rule): this customer-scaled frame feeds
    // five plan branches (the per-nation counts, the three quintile
    // scans, and the final join spine) — unmaterialized, each branch
    // re-runs the orders aggregation and the customer join.
    val withNation = graft.Materialize.stable(per.join(
      t(s, dir, "customer").select(col("c_custkey").as("custkey"),
        col("c_nationkey").as("nationkey")), Seq("custkey")))
    val n = withNation.groupBy("nationkey").agg(count(lit(1)).as("__n"))
    // ONE melted rank pass for all three dimensions (optimization r17):
    // the three per-dimension groupedRank calls each ran the two-level
    // scan machinery (two cumSumsBy = ~10 exchanges) plus a custkey
    // join — 3× identical plan shape over the same |C|-row frame. Rank
    // groups are independent per (nationkey, dimension), so melting to
    // (custkey, nationkey, dim, key) — 3|C| rows, one codegen'd explode
    // — computes all three quintiles in ONE groupedRank (same per-task
    // block bound; 75 groups instead of 25) and pivots back with one
    // hash aggregation. Same values, one third the stages; at scale the
    // scan is one pass over 3|C| narrow rows instead of three passes
    // over |C|.
    val melted = withNation.select(col("custkey"), col("nationkey"),
        explode(array(
          struct(lit(1L).as("d"), col("recency_days").as("k")),
          struct(lit(2L).as("d"), (-col("frequency")).as("k")),
          struct(lit(3L).as("d"),
            ((col("mon_dec") * 100).cast("long") * -1).as("k")))).as("dk"))
      .select(col("custkey"), col("nationkey"),
        col("dk.d").as("__dim"), col("dk.k").as("__k"))
    val tiles = graft.ops.Prefix
      .groupedRank(melted, Seq("nationkey", "__dim"), "__k", "custkey", "__r")
      .join(broadcast(n), Seq("nationkey"))
      .withColumn("__tile",
        graft.ops.Prefix.ntileOf(col("__r"), col("__n"), 5))
      .groupBy("custkey")
      .agg(max(when(col("__dim") === 1, col("__tile"))).as("r_tile"),
        max(when(col("__dim") === 2, col("__tile"))).as("f_tile"),
        max(when(col("__dim") === 3, col("__tile"))).as("m_tile"))
    withNation
      .join(tiles, Seq("custkey"))
      .select(col("custkey"), col("nationkey"), col("recency_days"),
        col("frequency"), col("mon_dec").cast("double").as("monetary"),
        col("r_tile"), col("f_tile"), col("m_tile"),
        concat(col("r_tile"), lit("-"), col("f_tile"), lit("-"),
          col("m_tile")).as("segment"))
      .orderBy("custkey")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q131_rfm_segments"     -> rfmSegments,
    "q122_rolling_revenue"  -> rollingRevenue,
    "q123_revenue_share"    -> revenueShare,
    "q21_order_rank"        -> orderRank,
    "q22_running_spend"     -> runningSpend,
    "q23_price_momentum"    -> priceMomentum,
    "q24_balance_quartiles" -> balanceQuartiles)

  val oracleSql: Map[String, String] = Map(
    "q131_rfm_segments" ->
      """WITH o AS (SELECT o_custkey AS custkey,
        |    CAST(o_totalprice AS DECIMAL(18,2)) AS price,
        |    CAST(o_orderdate AS DATE) AS od
        |  FROM orders),
        |a AS (SELECT MAX(od) AS anchor FROM o),
        |per AS (SELECT custkey, MAX(od) AS last_od,
        |    CAST(COUNT(*) AS BIGINT) AS frequency, SUM(price) AS mon_dec
        |  FROM o GROUP BY 1),
        |wn AS (SELECT per.custkey, c.c_nationkey AS nationkey,
        |    CAST(date_diff('day', last_od, anchor) AS BIGINT) AS recency_days,
        |    frequency, mon_dec
        |  FROM per CROSS JOIN a JOIN customer c ON c.c_custkey = per.custkey)
        |SELECT custkey, nationkey, recency_days, frequency,
        |  CAST(mon_dec AS DOUBLE) AS monetary,
        |  CAST(ntile(5) OVER (PARTITION BY nationkey
        |    ORDER BY recency_days, custkey) AS BIGINT) AS r_tile,
        |  CAST(ntile(5) OVER (PARTITION BY nationkey
        |    ORDER BY frequency DESC, custkey) AS BIGINT) AS f_tile,
        |  CAST(ntile(5) OVER (PARTITION BY nationkey
        |    ORDER BY mon_dec DESC, custkey) AS BIGINT) AS m_tile,
        |  CAST(ntile(5) OVER (PARTITION BY nationkey
        |      ORDER BY recency_days, custkey) AS VARCHAR)
        |    || '-' || CAST(ntile(5) OVER (PARTITION BY nationkey
        |      ORDER BY frequency DESC, custkey) AS VARCHAR)
        |    || '-' || CAST(ntile(5) OVER (PARTITION BY nationkey
        |      ORDER BY mon_dec DESC, custkey) AS VARCHAR) AS segment
        |FROM wn ORDER BY custkey""".stripMargin,
    "q122_rolling_revenue" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n_orders,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders GROUP BY 1)
        |SELECT a.day, a.n_orders,
        |  CAST(a.rev_dec AS DOUBLE) AS revenue,
        |  CAST((SELECT SUM(b.rev_dec) FROM daily b
        |        WHERE b.day BETWEEN a.day - 6 AND a.day) AS DOUBLE) AS revenue_7d,
        |  (SELECT CAST(SUM(b.n_orders) AS BIGINT) FROM daily b
        |   WHERE b.day BETWEEN a.day - 6 AND a.day) AS orders_7d
        |FROM daily a ORDER BY a.day""".stripMargin,
    "q123_revenue_share" ->
      """WITH rev AS (
        |  SELECT r_name AS region, n_name AS nation,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2)
        |SELECT region, nation,
        |  CAST(rev_dec AS DOUBLE) AS revenue,
        |  CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE) AS region_revenue,
        |  CAST(rev_dec AS DOUBLE)
        |    / CAST(SUM(rev_dec) OVER (PARTITION BY region) AS DOUBLE) AS share
        |FROM rev ORDER BY region, nation""".stripMargin,
    "q21_order_rank" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn, rk, drk FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER w AS rn,
        |    rank()       OVER w AS rk,
        |    dense_rank() OVER w AS drk
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey))
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q22_running_spend" ->
      """SELECT o_custkey, o_orderkey,
        |  ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey), 2) AS running_spend
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q23_price_momentum" ->
      """SELECT brand, year, month, avg_price,
        |  lag(avg_price, 1) OVER (PARTITION BY brand ORDER BY year, month) AS prev_price,
        |  avg_price - lag(avg_price, 1) OVER (PARTITION BY brand ORDER BY year, month) AS delta
        |FROM (
        |  SELECT p_brand AS brand,
        |    CAST(year(l_shipdate) AS INTEGER) AS year,
        |    CAST(month(l_shipdate) AS INTEGER) AS month,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 3)
        |ORDER BY brand, year, month""".stripMargin,
    "q24_balance_quartiles" ->
      """SELECT c_nationkey, c_custkey, c_acctbal,
        |  ntile(4) OVER w AS quartile,
        |  percent_rank() OVER w AS pct_rank
        |FROM customer
        |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_nationkey, c_acctbal, c_custkey""".stripMargin)
}
