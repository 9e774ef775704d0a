package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Corpus-curation operators for a training-data pipeline: deterministic stratified
 * sampling (dataset mixing) and a staged quality-filter funnel. The reference tool
 * curates page-by-page by hand (uiucprescon/ocr has no corpus layer); these are the
 * operations the same extraction output needs once it feeds model training at scale.
 *
 * Design rules shared with the rest of the engine:
 *  - pure Catalyst expressions only (whole-stage codegen, no UDFs), so every operator
 *    is a shuffle-free scan except the stated tiny aggregations;
 *  - every random-looking choice is a DETERMINISTIC hash — a re-run of the sampler
 *    over the same corpus selects byte-identical membership (training-data lineage:
 *    "which documents were in the mix" must be reproducible, not a seed-lost RNG
 *    draw), and the DuckDB oracle can predict the exact membership;
 *  - thresholds/rates live HERE and the oracle SQL interpolates them
 *    ([[graft.functions.OracleSqlCuration]]) — one source of truth, desync impossible.
 */
object Curation {

  /** Versioned salt for the sampling hash: bumping it re-rolls membership globally
    * (the knob a pipeline turns to draw a fresh mix without touching rates). */
  val MixSalt = "graft-mix-v1"

  /** Per-stratum keep rates (dataset mixing over the `lang` column). Deterministic
    * Seq, not Map — the when-chain and the oracle's CASE must enumerate in one order.
    * Rates are exact multiples of 2^-32 after [[thresholdHex]] floors them; 1.0 is
    * keep-all (no hash comparison). */
  val MixRates: Seq[(String, Double)] = Seq(
    "en" -> 0.50, // dominant stratum, downsampled
    "de" -> 0.75,
    "es" -> 0.25,
    "fr" -> 1.00, // scarce stratum, kept whole
    "zh" -> 0.10) // mostly filtered (e.g. a lang the downstream model excludes)

  /** Keep rate for strata not listed in [[MixRates]]. */
  val MixDefaultRate = 0.05

  /** A keep rate as an 8-hex-digit lexicographic threshold: keep iff the first 8 hex
    * chars of md5(salt:doc_id) sort strictly below it. Both engines emit lowercase
    * hex md5, and an 8-char lowercase-hex string comparison IS a uniform-u32
    * comparison, so the rule is portable without any hex->int conversion. */
  def thresholdHex(rate: Double): String =
    f"${math.min(math.floor(rate * 4294967296.0), 4294967295.0).toLong}%08x"

  /** The sampling key: first 8 hex chars of md5 over the salted doc id. Salting
    * makes draws independent across salt versions; doc_id (not text) keys the draw
    * so near-duplicate texts don't correlate membership. */
  private def sampleKey(docId: Column): Column =
    substring(md5(concat_ws(":", lit(MixSalt), docId.cast("string"))), 1, 8)

  /**
   * Deterministic stratified sample over `documents` (doc_id, lang, ...): keeps each
   * document iff its hash key falls under its stratum's threshold. Returns the kept
   * rows as (doc_id, lang, sample_key) — membership itself is the verified output.
   *
   * Scale: a pure filter — no shuffle, codegen'd, and at 100 TB it composes with
   * partition pruning (a lang-partitioned corpus reads only strata with rate > 0,
   * since `rate == 0` strata constant-fold to `false`). Exactness: per-stratum counts
   * are binomial around rate*N, never exact-N; pipelines that need exact counts do a
   * per-stratum top-K by sample_key instead (same determinism, one bounded agg) —
   * documented, not implemented, because the rate form is what mixing recipes use.
   */
  def sampleStratified(documents: DataFrame): DataFrame = {
    val key = sampleKey(col("doc_id"))
    val keep = MixRates.foldRight(
      // unknown stratum -> default rate
      key < lit(thresholdHex(MixDefaultRate)): Column) { case ((lang, rate), acc) =>
      val kept = if (rate >= 1.0) lit(true) else key < lit(thresholdHex(rate))
      when(col("lang") === lang, kept).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"), key.as("sample_key"))
      .filter(keep)
      .orderBy(col("doc_id"))
  }

  /** Dataset-card rollup: per (lang, source) cell — document/token/char totals,
    * length extremes, and exact-integer corpus share. The summary table a curated
    * training set ships with (and the input to mixing-rate decisions like
    * [[MixRates]]). One shuffle over ~|langs|x|sources| keys with map-side partials;
    * the token counts ride the same single token-array pass as everything else. */
  def corpusStats(documents: DataFrame): DataFrame = {
    val total = documents.count() // share denominator: one tiny job
    val nTok = size(split(col("text"), " ")).cast("long")
    documents
      .select(col("lang"), col("source"), nTok.as("n_tok"), col("n_chars"))
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_chars")).cast("long").as("n_chars"),
        min(col("n_tok")).as("min_tokens"),
        max(col("n_tok")).as("max_tokens"))
      .withColumn("share_e6",
        floor(lit(1000000.0) * col("n_docs") / lit(total)).cast("long"))
      .orderBy(col("lang"), col("source"))
  }

  // ---- quality funnel -----------------------------------------------------------

  /** Funnel thresholds (applied to the exact-integer metrics of
    * [[TextAnalysis.quality]]; _e6 = floor(1e6 * ratio)). Order matters: a document
    * is labeled with the FIRST stage that rejects it. */
  val MinTokens = 25L
  val MinRichnessE6 = 350000L // distinct/total below this = boilerplate/templated
  val MaxStopRatioE6 = 250000L // stopword-stuffed
  // zero stopwords = gibberish heuristic (final stage; no threshold constant)

  /** Funnel stage names in evaluation order, then the accept label. */
  val FunnelStages: Seq[String] =
    Seq("too_short", "low_richness", "stopword_heavy", "no_stopwords", "pass")

  /** Per-document verdict: (doc_id, stage, kept). Shuffle-free scan; the same
    * token-array pass computes all three metrics. */
  def qualityFilter(documents: DataFrame): DataFrame = {
    val t = split(col("text"), " ")
    val nTok = size(t).cast("long")
    val nDist = size(array_distinct(t)).cast("long")
    val nStop = size(filter(t, x => x.isin(TextAnalysis.Stopwords: _*))).cast("long")
    val richness = floor(lit(1000000.0) * nDist / nTok).cast("long")
    val stopRatio = floor(lit(1000000.0) * nStop / nTok).cast("long")
    val stage = when(nTok < MinTokens, FunnelStages(0))
      .when(richness < MinRichnessE6, FunnelStages(1))
      .when(stopRatio > MaxStopRatioE6, FunnelStages(2))
      .when(nStop === 0L, FunnelStages(3))
      .otherwise(FunnelStages(4))
    documents
      .select(col("doc_id"), stage.as("stage"))
      .withColumn("kept", when(col("stage") === FunnelStages(4), 1).otherwise(0))
      .orderBy(col("doc_id"))
  }

  /** The funnel report: per-stage document counts + exact-integer share of the
    * corpus. One tiny agg (5 groups) over the filter scan — the observability row a
    * curation run logs beside its snapshot lineage. Stages with zero documents still
    * appear (a funnel that silently drops a stage label reads as "stage never
    * fired", which is exactly the bug it should surface), via a literal stage dim. */
  def qualityFunnel(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    val total = documents.count() // one tiny job; the share denominator
    import spark.implicits._
    val stageDim = FunnelStages.zipWithIndex.toDF("stage", "stage_idx")
    val counts = qualityFilter(documents).groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"))
    stageDim.join(counts, Seq("stage"), "left")
      .select(col("stage_idx").cast("int").as("stage_idx"), col("stage"),
        coalesce(col("n_docs"), lit(0L)).as("n_docs"),
        floor(lit(1000000.0) * coalesce(col("n_docs"), lit(0L)) / lit(total))
          .cast("long").as("share_e6"))
      .orderBy(col("stage_idx"))
  }
}
