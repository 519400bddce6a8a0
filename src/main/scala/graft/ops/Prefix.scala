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
      block: Long = 1L << 20): DataFrame = {
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
    local.join(broadcast(offsets), keyCols)
      .select(df.columns.map(col).toSeq ++ sumCols.map(c =>
        (col(s"${c}_cum") + col(s"__off_$c")).as(s"${c}_cum")): _*)
  }
}
