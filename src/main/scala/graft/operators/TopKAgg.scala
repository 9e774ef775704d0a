package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One similarity candidate: score (already integer-quantized) + neighbor id. */
final case class TopKItem(cos_e6: Long, id: Long)

/** Bounded buffer — at most k items at any moment, sorted best-first. */
final case class TopKList(items: Seq[TopKItem])

/**
 * Bounded top-k aggregator for similarity search.
 *
 * The scale-critical property: this is an `Aggregator`, so Spark runs it with MAP-SIDE
 * PARTIAL aggregation — each input partition reduces its candidates to at most k rows
 * before the shuffle, so a query's shuffle volume is O(k × partitions), not O(N).
 * A `row_number().over(Window.partitionBy(query))` plan would shuffle every candidate
 * (N rows per query) to a single reducer; at 10^12-vector scale that is the difference
 * between a working plan and a dead one.
 *
 * Ordering is total and deterministic — (cos_e6 DESC, id ASC) — so the result is
 * independent of partitioning and arrival order, which is what lets a single-threaded
 * oracle verify the distributed answer exactly.
 */
final class TopKAgg(k: Int) extends Aggregator[TopKItem, TopKList, TopKList] {

  private def best(items: Seq[TopKItem]): Seq[TopKItem] =
    items.sortBy(i => (-i.cos_e6, i.id)).take(k)

  /** (a better-than b) under the total order (cos_e6 DESC, id ASC). */
  private def beats(a: TopKItem, b: TopKItem): Boolean =
    a.cos_e6 > b.cos_e6 || (a.cos_e6 == b.cos_e6 && a.id < b.id)

  def zero: TopKList = TopKList(Seq.empty)

  /** Bounded insertion, not a re-sort: the buffer is kept sorted best-first, so the
    * overwhelmingly common case at scale — a candidate worse than the current k-th of
    * a full buffer — is one comparison and zero allocation. Displacing inserts splice
    * at the insertion point (O(k) copy, no sort). */
  def reduce(b: TopKList, in: TopKItem): TopKList = {
    val items = b.items
    if (items.size >= k && !beats(in, items.last)) return b
    val at = items.indexWhere(cur => beats(in, cur)) match {
      case -1 => items.size
      case i => i
    }
    val grown = (items.take(at) :+ in) ++ items.drop(at)
    TopKList(if (grown.size > k) grown.take(k) else grown)
  }

  def merge(a: TopKList, b: TopKList): TopKList = TopKList(best(a.items ++ b.items))
  def finish(b: TopKList): TopKList = b

  def bufferEncoder: Encoder[TopKList] = Encoders.product[TopKList]
  def outputEncoder: Encoder[TopKList] = Encoders.product[TopKList]
}
