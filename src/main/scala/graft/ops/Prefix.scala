package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sums — the two-level scan that replaces the
  * classic `Window.orderBy(k)` running total, whose unpartitioned
  * WindowExec funnels the whole frame through ONE task (fine at 10⁴
  * rows, a scale-killer at 10⁸: the cumulative-curve reports that most
  * need to run at corpus scale would be the ones that can't).
  *
  * Level 1 partitions the frame into fixed value-range blocks and runs
  * the running sum per block — an ordinary partitioned window, ≤ `block`
  * rows per task, fully parallel. Level 2 turns per-block totals into
  * exclusive block offsets with a strict-inequality self-join over the
  * block-totals frame (|frame|/block rows — a broadcastable sliver even
  * when the frame itself is 10⁹ rows) and broadcasts them back. No
  * unpartitioned window anywhere in the plan; the offset join is a
  * broadcast nested-loop over B² pairs of longs with B = |frame|/block
  * (at the default 1M block, a 2·10⁹-row frame gives B = 2000 → 4·10⁶
  * pairs — noise).
  *
  * THE SECOND-LEVEL BOUND, named (r15 verdict item 8): every frame the
  * scan produces after level 1 — block totals and exclusive offsets —
  * has exactly one row per (group, occupied block), i.e. ≤ |groups| ·
  * ⌈key range / block⌉ rows, bounded by the ORDER-KEY RANGE and the
  * group cardinality, never by the corpus row count (PrefixSpec pins
  * the count). That is why a `WindowExec: No Partition Defined`
  * warning in a test run is never this scan: Prefix's own windows are
  * all partitioned on (group, block); the warning's sources are the
  * documented bounded-frame sites (calendar-day and degree-band
  * frames: WindowQueries.rollingRevenue, GraphOps.degreeProfileOf,
  * DataGen's 731-row date dim), whose inputs are aggregation outputs
  * on bounded keys — the exemption class PlanAuditSpec encodes.
  */
object Prefix {

  /** Add `"${c}_cum"` running-total columns (ordered by `orderCol`) for
    * each column in `sumCols`. Contract: `orderCol` holds DISTINCT
    * integral values (bucket ids, histogram keys), so a value-range
    * block holds at most `block` rows. */
  def cumSums(df: DataFrame, orderCol: String, sumCols: Seq[String],
      block: Long = 1L << 20): DataFrame =
    cumSumsBy(df, Nil, orderCol, sumCols, Nil, block)

  /** Grouped form: the same two-level scan run independently per
    * `groupCols` key — the replacement for the low-cardinality
    * `Window.partitionBy(group).orderBy(v)` over a corpus-sized frame,
    * which sorts each group's entire history in ONE task. Level-1
    * windows partition on (group, block) so every task is ≤ `block`
    * rows regardless of group skew; level-2 offsets are per (group,
    * block) — |groups|·B rows, broadcast back (callers keep |groups|·B
    * bounded: histogram-keyed frames over low-cardinality groups).
    *
    * `tieCols` extends the LOCAL window ordering (not the block key):
    * when `orderCol` is a derived integral key (e.g. a cents/micro
    * bucket of a double), distinct row values can share a key, and an
    * order-key tie would make each row's running sum depend on
    * arbitrary within-key order. Pass the underlying value column(s) —
    * the key must be monotone in them — and the scan's row order is
    * exactly the value order. Ties live inside one block by
    * construction, so block offsets are unaffected. */
  def cumSumsBy(df: DataFrame, groupCols: Seq[String], orderCol: String,
      sumCols: Seq[String], tieCols: Seq[String] = Nil,
      block: Long = 1L << 20, broadcastOffsets: Boolean = true): DataFrame = {
    val blk = "__blk"
    val keyCols = groupCols :+ blk
    val withBlk = df.withColumn(blk, floor(col(orderCol) / block))
    val wLocal = Window.partitionBy(keyCols.map(col): _*)
      .orderBy((orderCol +: tieCols).map(col): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = sumCols.foldLeft(withBlk) { (d, c) =>
      d.withColumn(s"${c}_cum", sum(col(c)).over(wLocal))
    }
    val totals = withBlk.groupBy(keyCols.map(col): _*).agg(
      sum(col(sumCols.head)).as(s"__tot_${sumCols.head}"),
      sumCols.tail.map(c => sum(col(c)).as(s"__tot_$c")): _*)
    // exclusive prefix over blocks: sum of all strictly-earlier totals
    // within the same group
    val sameGroup = groupCols.map(g => col(s"b.$g") === col(s"a.$g"))
    val earlier = (sameGroup :+ (col(s"b.$blk") < col(s"a.$blk"))).reduce(_ && _)
    val offsets = totals.as("a")
      .join(totals.as("b"), earlier, "left")
      .groupBy(keyCols.map(k => col(s"a.$k").as(k)): _*)
      .agg(
        coalesce(sum(col(s"b.__tot_${sumCols.head}")), lit(0L))
          .as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(col(s"b.__tot_$c")), lit(0L)).as(s"__off_$c")): _*)
    // Callers whose (group, block) space is bounded by a VALUE RANGE
    // broadcast the offsets (the default); callers whose groups are
    // data-scaled (e.g. tie groups keyed by near-distinct values) must
    // NOT — a broadcast of a data-scaled frame is a driver OOM — and
    // take a shuffle join instead.
    val off = if (broadcastOffsets) broadcast(offsets) else offsets
    local.join(off, keyCols)
      .select(df.columns.map(col).toSeq ++ sumCols.map(c =>
        (col(s"${c}_cum") + col(s"__off_$c")).as(s"${c}_cum")): _*)
  }

  /** Exact 1-based per-group rank of every row under (`keyCol` asc,
    * `tieCol` asc) — the distributed replacement for
    * `row_number().over(partitionBy(group).orderBy(v, id))` when
    * `group` is low-cardinality and the frame is data-scaled (the
    * per-group sort window funnels each group's entire history through
    * one task; ntile/percent_rank then follow from the rank and the
    * group size by integer arithmetic).
    *
    * Contract: `keyCol` is an integral (LongType) monotone encoding of
    * the sort value — cents/micro units for grid doubles/decimals,
    * negated for descending — and `tieCol` is integral and UNIQUE
    * within (group, key), so the rank is total and deterministic.
    *
    * rank = (rows with a strictly smaller key in the group)
    *      + (rank by tie key among rows sharing this exact key):
    * the strict count comes off the (group, key) histogram — key-range
    * blocks, broadcast offsets (bounded by value range / block, NOT by
    * data size) — and the tie rank from a scan over tie-key-range
    * blocks whose offsets are shuffle-joined, since tie groups follow
    * the data distribution (a skewed value can hold a corpus share, and
    * its block count scales with it). Every window task in both scans
    * is ≤ `block` rows regardless of group or value skew. */
  def groupedRank(df: DataFrame, groupCols: Seq[String], keyCol: String,
      tieCol: String, out: String, block: Long = 1L << 20): DataFrame = {
    val one = "__one"
    val tie = cumSumsBy(df.withColumn(one, lit(1L)), groupCols :+ keyCol,
        tieCol, Seq(one), Nil, block, broadcastOffsets = false)
      .withColumnRenamed(s"${one}_cum", "__t").drop(one)
    val hist = df.groupBy((groupCols :+ keyCol).map(col): _*)
      .agg(count(lit(1)).as("__cnt"))
    val strict = cumSumsBy(hist, groupCols, keyCol, Seq("__cnt"), Nil, block)
      .select((groupCols :+ keyCol).map(col) :+
        (col("__cnt_cum") - col("__cnt")).as("__s"): _*)
    tie.join(strict, groupCols :+ keyCol)
      .withColumn(out, col("__s") + col("__t"))
      .drop("__s", "__t")
  }

  /** SQL-standard NTILE(k) from a total 1-based rank and the group size:
    * the first n%k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — integer
    * arithmetic only, so Spark and any SQL oracle agree exactly. */
  def ntileOf(rank: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column,
      k: Int): org.apache.spark.sql.Column = {
    val q = floor(n / k).cast("long")
    val r = pmod(n, lit(k.toLong)).cast("long")
    val bigSpan = r * (q + 1)
    when(rank <= bigSpan, floor((rank - 1) / (q + 1)).cast("long") + 1)
      .otherwise(r + floor((rank - bigSpan - 1) / greatest(q, lit(1L)))
        .cast("long") + 1)
  }
}
