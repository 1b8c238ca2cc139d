package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One ranked entry: `v` the ordering value (descending), `id` the
  * deterministic tiebreak (ascending). Top-level so Spark codegen can
  * construct it.
  */
final case class TopKItem(v: Long, id: Long)

/** [[TopKAgg]] state: at most k items, sorted by (v desc, id asc). */
final case class TopKBuf(items: Seq[TopKItem])

/** Bounded-state per-group top-k: a mergeable aggregate holding at most `k`
  * (value, id) entries, combined map-side like any hash aggregate.
  *
  * The window formulation (`row_number() over (partition by grp order by v
  * desc) <= k`) ships EVERY row of a group into one task's sort — at 100 TB a
  * low-cardinality group column (order priorities, countries, status codes)
  * makes that a handful of giant sort partitions. This aggregate's task state
  * is O(k) per group regardless of group size, and partial aggregation
  * already shrinks each map task's output to ≤ k rows per group before the
  * shuffle. Ties break on ascending `id`, so results are deterministic under
  * retries and engine-portable.
  */
final class TopKAgg(k: Int) extends Aggregator[(Long, Long), TopKBuf, Seq[TopKItem]] {
  require(k > 0, s"k=$k must be positive")

  private def ahead(x: TopKItem, v: Long, id: Long): Boolean =
    x.v > v || (x.v == v && x.id < id)

  def zero: TopKBuf = TopKBuf(Nil)

  def reduce(b: TopKBuf, a: (Long, Long)): TopKBuf = {
    val (v, id) = a
    if (b.items.lengthCompare(k) >= 0 && ahead(b.items.last, v, id)) b
    else {
      val (le, gt) = b.items.span(ahead(_, v, id))
      TopKBuf((le ++ (TopKItem(v, id) +: gt)).take(k))
    }
  }

  def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(
      (x.items ++ y.items).sortBy(t => (-t.v, t.id)).take(k))

  def finish(b: TopKBuf): Seq[TopKItem] = b.items

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[Seq[TopKItem]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[TopKItem]]()
}
