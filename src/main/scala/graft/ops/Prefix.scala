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
      block: Long = 1L << 20): DataFrame = {
    val blk = "__blk"
    val withBlk = df.withColumn(blk, floor(col(orderCol) / block))
    val wLocal = Window.partitionBy(blk).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, 0)
    val local = sumCols.foldLeft(withBlk) { (d, c) =>
      d.withColumn(s"${c}_cum", sum(col(c)).over(wLocal))
    }
    val totals = withBlk.groupBy(col(blk)).agg(
      sum(col(sumCols.head)).as(s"__tot_${sumCols.head}"),
      sumCols.tail.map(c => sum(col(c)).as(s"__tot_$c")): _*)
    // exclusive prefix over blocks: sum of all strictly-earlier totals
    val offsets = totals.as("a")
      .join(totals.as("b"), col(s"b.$blk") < col(s"a.$blk"), "left")
      .groupBy(col(s"a.$blk").as(blk))
      .agg(
        coalesce(sum(col(s"b.__tot_${sumCols.head}")), lit(0L))
          .as(s"__off_${sumCols.head}"),
        sumCols.tail.map(c =>
          coalesce(sum(col(s"b.__tot_$c")), lit(0L)).as(s"__off_$c")): _*)
    local.join(broadcast(offsets), Seq(blk))
      .select(df.columns.map(col).toSeq ++ sumCols.map(c =>
        (col(s"${c}_cum") + col(s"__off_$c")).as(s"${c}_cum")): _*)
  }
}
