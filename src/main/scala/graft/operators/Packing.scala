package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Sequence PACKING for LLM pretraining export: documents are concatenated in a
 * deterministic total order and split into fixed-capacity context windows of
 * [[Capacity]] tokens; each document is mapped to the window range it lands in.
 * This is the "concat-and-chunk" packing used to build pretraining batches (a
 * document may straddle a window boundary; `start_offset` is its position inside
 * its first window), the last mile between a curated corpus and a trainer's
 * sampler. Two orders are provided: corpus order ([[seqPack]], by doc_id) and
 * TRAINING order ([[seqPackShuffled]], a deterministic md5 permutation — the
 * standard "shuffle once, read sequentially" layout; re-runs are byte-identical
 * and the draw re-rolls by bumping the salt).
 *
 * Scale design — the global running token count is a PREFIX SUM over a total order,
 * and the naive form (one `Window.orderBy` with no partition key) collapses the
 * whole corpus into a single task. Instead the classic two-level scan:
 *
 *  1. split the sort key's DOMAIN into ORDER-PRESERVING buckets (id-range chunks
 *     for doc_id order; leading-hex-nibble ranges of the hash key for shuffled
 *     order — a bucket is a contiguous key range either way, so bucket order IS
 *     concatenation order);
 *  2. one tiny aggregation produces per-bucket token totals (bounded rows to the
 *     driver — same contract as the snapshot manifest);
 *  3. the driver computes the EXCLUSIVE prefix of those totals and broadcasts it
 *     as a map literal;
 *  4. each bucket computes its local running sum independently (window partitioned
 *     by bucket) and adds its broadcast base offset.
 *
 * Every stage is embarrassingly parallel except the bounded driver fold; at 100 TB
 * the bucket count scales with the task count (hash-prefix buckets are uniform by
 * construction; id-range chunks stay balanced because ids are assigned densely by
 * ingest), and window arithmetic is integer `DIV`/`pmod` on BIGINT — never a double
 * division, which silently loses token positions past 2^53 at trillion-token scale.
 */
object Packing {

  /** Context-window capacity in tokens (whitespace tokenization — the same
    * tokenizer as [[TextAnalysis.tokenStats]]; a BPE tokenizer would plug in at the
    * `n_tokens` column). */
  val Capacity = 1024L

  /** Number of order-preserving id-range chunks for the two-level prefix sum. */
  val DefaultBuckets = 64

  /** Versioned salt for the shuffled-order permutation: bumping it re-deals the
    * training order globally without touching membership (same convention as
    * [[Curation.MixSalt]]). */
  val ShuffleSalt = "graft-pack-v1"

  /** Hex alphabet for order-preserving nibble bucketing of the hash key. */
  private val HexChars = "0123456789abcdef"

  /** Two-level prefix sum over `stats` (any columns + n_tokens + bucket), ordered
    * within buckets by `order`; emits cum_before. Buckets MUST be order-preserving
    * ranges of the global sort order — the caller's contract. */
  private def packCore(stats: DataFrame, order: Seq[Column]): DataFrame = {
    val totals = stats.groupBy(col("bucket"))
      .agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    var acc = 0L
    val offsets: Map[Int, Long] = (0 to totals.keys.foldLeft(0)(math.max)).map { b =>
      val base = acc; acc += totals.getOrElse(b, 0L); b -> base
    }.toMap
    val w = Window.partitionBy(col("bucket")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    stats.withColumn("cum_before",
      coalesce(sum(col("n_tokens")).over(w), lit(0L))
        + element_at(typedLit(offsets), col("bucket")))
  }

  private def windowCols(capacity: Long): Seq[Column] = Seq(
    expr(s"cum_before DIV $capacity").as("start_window"),
    expr(s"(cum_before + n_tokens - 1) DIV $capacity").as("end_window"),
    pmod(col("cum_before"), lit(capacity)).as("start_offset"))

  /**
   * Corpus-order packing: (doc_id, n_tokens, start_window, end_window,
   * start_offset), windows over the concatenation of all documents in ascending
   * doc_id order.
   */
  def seqPack(documents: DataFrame, capacity: Long = Capacity,
      nBuckets: Int = DefaultBuckets): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val stats = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))

    // empty input (reachable via curate_pipeline when every doc is filtered out):
    // an empty pack, not an NPE off the null max
    val maxRow = stats.agg(max(col("doc_id"))).head
    if (maxRow.isNullAt(0))
      return stats.withColumn("cum_before", lit(0L))
        .select(Seq(col("doc_id"), col("n_tokens")) ++ windowCols(capacity): _*)
        .limit(0)

    // order-preserving chunking of the id range; ceil so bucket ids stay < nBuckets.
    // Integer DIV, not `/`: Spark's Divide is double-valued, and the module's
    // contract is that position arithmetic never rounds past 2^53
    val maxId = maxRow.getLong(0)
    val chunk = math.max(1L, (maxId + nBuckets) / nBuckets)
    val bucketed = stats.withColumn("bucket",
      expr(s"doc_id DIV $chunk").cast("int"))

    packCore(bucketed, Seq(col("doc_id")))
      .select(Seq(col("doc_id"), col("n_tokens")) ++ windowCols(capacity): _*)
      .orderBy(col("doc_id"))
  }

  /**
   * TRAINING-order packing: documents are concatenated in the order of a
   * deterministic md5 permutation (`sort_key` = first 8 hex chars of
   * md5(salt:doc_id), ties broken by doc_id) and chunked at `capacity` tokens.
   * Buckets are leading-nibble ranges of the key — contiguous in key order, so
   * the two-level scan composes exactly as in [[seqPack]]; 16 here, more leading
   * nibbles at scale (256/4096-way, still order-preserving by construction).
   * Output adds `sort_key` so the realized order is itself part of the verified
   * value hash.
   */
  def seqPackShuffled(documents: DataFrame, capacity: Long = Capacity,
      salt: String = ShuffleSalt): DataFrame = {
    require(capacity > 0, s"capacity must be positive, got $capacity")
    val key = substring(
      md5(concat_ws(":", lit(salt), col("doc_id").cast("string"))), 1, 8)
    val stats = documents.select(col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"),
      key.as("sort_key"))
    // leading nibble of the key (0..15) — order-preserving bucket over hex strings;
    // pure Catalyst, mirrored by DuckDB's instr over the same alphabet literal
    val bucketed = stats.withColumn("bucket",
      expr(s"locate(substring(sort_key, 1, 1), '$HexChars') - 1").cast("int"))
    packCore(bucketed, Seq(col("sort_key"), col("doc_id")))
      .select(Seq(col("doc_id"), col("n_tokens"), col("sort_key"))
        ++ windowCols(capacity): _*)
      .orderBy(col("doc_id"))
  }
}
