package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence PACKING for LLM pretraining export: documents are concatenated in doc_id
 * order and split into fixed-capacity context windows of [[Capacity]] tokens; each
 * document is mapped to the window range it lands in. This is the
 * "concat-and-chunk" packing used to build pretraining batches (a document may
 * straddle a window boundary; `start_offset` is its position inside its first
 * window), the last mile between a curated corpus and a trainer's sampler.
 *
 * Scale design — the global running token count is a PREFIX SUM over a total order,
 * and the naive form (one `Window.orderBy(doc_id)` with no partition key) collapses
 * the whole corpus into a single task. Instead the classic two-level scan:
 *
 *  1. split the id range into [[DefaultBuckets]] ORDER-PRESERVING chunks
 *     (`doc_id div chunk` — contiguous id ranges, not hash buckets, so bucket order
 *     IS document order);
 *  2. one tiny aggregation produces per-bucket token totals (B rows to the driver —
 *     bounded metadata, same pattern as the snapshot manifest);
 *  3. the driver computes the EXCLUSIVE prefix of those totals and broadcasts it as
 *     a map literal;
 *  4. each bucket computes its local running sum independently (window partitioned
 *     by bucket) and adds its broadcast base offset.
 *
 * Every stage is embarrassingly parallel except the B-row driver fold; at 100 TB,
 * B scales with the task count (id-range chunks stay balanced because ids are
 * assigned densely by ingest), and window arithmetic is integer `div`/`pmod` on
 * BIGINT — never a double division, which silently loses token positions past
 * 2^53 at trillion-token scale.
 */
object Packing {

  /** Context-window capacity in tokens (whitespace tokenization — the same
    * tokenizer as [[TextAnalysis.tokenStats]]; a BPE tokenizer would plug in at the
    * `n_tokens` column). */
  val Capacity = 1024L

  /** Number of order-preserving id-range chunks for the two-level prefix sum. */
  val DefaultBuckets = 64

  /**
   * Per-document window placement: (doc_id, n_tokens, start_window, end_window,
   * start_offset), where windows are [[Capacity]]-token slots over the
   * concatenation of all documents in ascending doc_id order and
   * `start_offset` = position of the document's first token inside `start_window`.
   */
  def seqPack(documents: DataFrame, capacity: Long = Capacity,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val stats = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

    // order-preserving chunking of the id range; ceil so bucket ids stay < nBuckets
    val maxId = stats.agg(max(col("doc_id"))).head.getLong(0)
    val chunk = math.max(1L, (maxId + nBuckets) / nBuckets)
    val bucketed = stats.withColumn("bucket", (col("doc_id") / lit(chunk)).cast("int"))

    // level 1: per-bucket totals -> exclusive prefix on the driver (<= nBuckets rows)
    val totals = bucketed.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets: Map[Int, Long] = (0 to totals.keys.foldLeft(0)(math.max)).map { b =>
      val base = acc; acc += totals.getOrElse(b, 0L); b -> base
    }.toMap

    // level 2: bucket-local running sum + broadcast base offset
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed
      .withColumn("cum_before",
        coalesce(sum(col("n_tokens")).over(w), lit(0L))
          + element_at(typedLit(offsets), col("bucket")))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"cum_before DIV $capacity").as("start_window"),
        expr(s"(cum_before + n_tokens - 1) DIV $capacity").as("end_window"),
        pmod(col("cum_before"), lit(capacity)).as("start_offset"))
      .orderBy(col("doc_id"))
  }
}
