package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed top-k aggregator (SURVEY.md §2.9's one custom-Aggregator
  * candidate).
  *
  * The window form of per-group top-k (`row_number().over(...) <= k`)
  * shuffles every row to its group's partition and sorts there. This
  * Aggregator keeps a bounded k-buffer per group on the map side, so only
  * k candidates per group per input partition cross the shuffle —
  * the right trade at 100 TB when k ≪ group size. Ordering is total
  * (value desc, then id asc) so results are deterministic under ties.
  */
object TopKAggregator {

  case class Entry(id: Long, value: Double)

  private def topK(entries: Seq[Entry], k: Int): Seq[Entry] =
    entries.sortBy(e => (-e.value, e.id)).take(k)

  def apply(k: Int): Aggregator[Entry, Seq[Entry], Seq[Entry]] =
    new Aggregator[Entry, Seq[Entry], Seq[Entry]] {
      override def zero: Seq[Entry] = Vector.empty
      override def reduce(buf: Seq[Entry], e: Entry): Seq[Entry] =
        if (buf.size < k) topK(buf :+ e, k)
        else {
          val worst = buf.last // buf kept sorted desc
          if (e.value > worst.value || (e.value == worst.value && e.id < worst.id))
            topK(buf :+ e, k)
          else buf
        }
      override def merge(a: Seq[Entry], b: Seq[Entry]): Seq[Entry] = topK(a ++ b, k)
      override def finish(r: Seq[Entry]): Seq[Entry] = topK(r, k)
      override def bufferEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
      override def outputEncoder: Encoder[Seq[Entry]] = Encoders.kryo[Seq[Entry]]
    }
}
