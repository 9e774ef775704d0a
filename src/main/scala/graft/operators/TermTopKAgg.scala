package graft.operators

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored term candidate for per-document salient-term selection. */
final case class TermTopKItem(score_e6: Long, term: String, tf: Long, df: Long)

/** Bounded buffer — at most k items at any moment, sorted best-first. */
final case class TermTopKList(items: Seq[TermTopKItem])

/**
 * Bounded top-k aggregator for per-document salient terms — the [[TopKAgg]] shape
 * applied to the text family. Replaces the original
 * `row_number().over(Window.partitionBy(doc_id))` plan, which shuffles and SORTS
 * every (doc, term) pair to take 3 of them: as an `Aggregator` this runs with
 * map-side partial aggregation (each partition reduces a document's candidates to at
 * most k before the shuffle) and no sort at all.
 *
 * Ordering is total and deterministic — (score_e6 DESC, term ASC in UTF-8 BINARY
 * order) — matching both the previous Window ordering and the DuckDB oracle's
 * collation, so results are independent of partitioning and arrival order. The term
 * tie-break compares UTF8String bytes, not Java String code units: the two orders
 * differ for supplementary-plane characters, and the oracle compares bytes.
 */
final class TermTopKAgg(k: Int)
    extends Aggregator[TermTopKItem, TermTopKList, TermTopKList] {

  private def termLess(a: String, b: String): Boolean =
    org.apache.spark.unsafe.types.UTF8String.fromString(a)
      .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b)) < 0

  /** (a better-than b) under the total order (score_e6 DESC, term ASC). */
  private def beats(a: TermTopKItem, b: TermTopKItem): Boolean =
    a.score_e6 > b.score_e6 ||
      (a.score_e6 == b.score_e6 && termLess(a.term, b.term))

  private def best(items: Seq[TermTopKItem]): Seq[TermTopKItem] =
    items.sortWith(beats).take(k)

  def zero: TermTopKList = TermTopKList(Seq.empty)

  /** Bounded insertion (see [[TopKAgg.reduce]]): the common worse-than-k-th case is
    * one comparison, zero allocation. */
  def reduce(b: TermTopKList, in: TermTopKItem): TermTopKList = {
    val items = b.items
    if (items.size >= k && !beats(in, items.last)) return b
    val at = items.indexWhere(cur => beats(in, cur)) match {
      case -1 => items.size
      case i => i
    }
    val grown = (items.take(at) :+ in) ++ items.drop(at)
    TermTopKList(if (grown.size > k) grown.take(k) else grown)
  }

  def merge(a: TermTopKList, b: TermTopKList): TermTopKList =
    TermTopKList(best(a.items ++ b.items))
  def finish(b: TermTopKList): TermTopKList = b

  def bufferEncoder: Encoder[TermTopKList] = Encoders.product[TermTopKList]
  def outputEncoder: Encoder[TermTopKList] = Encoders.product[TermTopKList]
}
