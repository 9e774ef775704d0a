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

  // ---- token-budget mixture ------------------------------------------------------

  /** Salt for the budget-mix draw — independent of [[MixSalt]], so budget mixes and
    * stratified samples never correlate membership. */
  val BudgetSalt = "graft-budget-v1"

  /** Target budget as a fraction of the corpus's measured token total. */
  val BudgetFrac = 0.5

  /** Target token SHARES of the budget per lang (a mixing recipe — e.g. DoReMi-style
    * static weights). Langs absent here get share 0 = excluded. Seq, not Map: the
    * when-chain and the oracle CASE must enumerate in one order. */
  val BudgetShares: Seq[(String, Double)] = Seq(
    "en" -> 0.35, // downweighted vs its natural ~40-50% share
    "de" -> 0.25, // upweighted
    "es" -> 0.20,
    "fr" -> 0.15,
    "zh" -> 0.05)

  private def budgetKey(docId: Column): Column =
    substring(md5(concat_ws(":", lit(BudgetSalt), docId.cast("string"))), 1, 8)

  /** Per-lang (tokens_total, budget_tokens, keep-all?) derived from measured totals:
    * budget_total = floor(BudgetFrac * T), budget_lang = floor(budget_total * share).
    * Every arithmetic step is a single IEEE double op over exact BIGINTs (< 2^53),
    * so the DuckDB oracle reproduces the thresholds bit-exactly. */
  private def budgetTable(documents: DataFrame): Seq[(String, Long, Long)] = {
    val totals = documents
      .select(col("lang"), size(split(col("text"), " ")).cast("long").as("n_tok"))
      .groupBy(col("lang")).agg(sum(col("n_tok")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val budgetTotal = math.floor(BudgetFrac * totals.values.sum).toLong
    val shares = BudgetShares.toMap
    totals.toSeq.sortBy(_._1).map { case (lang, t) =>
      (lang, t, math.floor(budgetTotal * shares.getOrElse(lang, 0.0)).toLong)
    }
  }

  /**
   * CLOSED-LOOP dataset mixing: sample each lang at the rate that hits a target
   * per-lang TOKEN budget, with the rates DERIVED from the corpus's measured token
   * totals rather than hand-tuned ([[sampleStratified]] is the open-loop form). A
   * lang whose natural tokens fall under its budget is kept whole; one over budget
   * is hash-downsampled at rate budget/total. Membership is deterministic
   * (md5-threshold, [[BudgetSalt]]) — re-runs are byte-identical, and the oracle
   * predicts exact membership because threshold derivation is bit-exact double
   * arithmetic on both engines.
   *
   * Scale: one map-side-partial agg over |langs| keys (the totals), a bounded
   * driver fold, then a shuffle-free codegen'd filter — the same composes-with-
   * partition-pruning shape as [[sampleStratified]].
   */
  def tokenBudgetMix(documents: DataFrame): DataFrame =
    tokenBudgetMixFrom(documents, budgetTable(documents))

  /** The mix filter given an already-computed budget table — lets
    * [[tokenBudgetStats]] reuse one totals aggregation for both the report dim
    * and the membership filter (two full-corpus aggregates would be a redundant
    * scan at 100 TB). */
  private def tokenBudgetMixFrom(
      documents: DataFrame, table: Seq[(String, Long, Long)]): DataFrame = {
    val key = budgetKey(col("doc_id"))
    val keep = table.foldRight(lit(false): Column) {
      case ((lang, t, b), acc) =>
        val kept =
          if (t <= b) lit(true)
          else if (b == 0L) lit(false)
          else key < lit(thresholdHex(b.toDouble / t.toDouble))
        when(col("lang") === lang, kept).otherwise(acc)
    }
    documents
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_tok"),
        key.as("sample_key"))
      .filter(keep)
      .orderBy(col("doc_id"))
  }

  /** The mixing report beside [[tokenBudgetMix]]: per lang — measured tokens, token
    * budget, derived keep rate (e6-quantized), kept docs and kept tokens. Kept
    * counts are binomial around the target (exactness note on [[sampleStratified]]
    * applies); the report is how a pipeline audits realized-vs-target mix. */
  def tokenBudgetStats(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    val table = budgetTable(documents) // computed once, reused by the filter below
    val dim = table.toDF("lang", "tokens_total", "budget_tokens")
    val kept = tokenBudgetMixFrom(documents, table)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tok")).as("kept_tokens"))
    dim.join(kept, Seq("lang"), "left")
      .select(col("lang"), col("tokens_total"), col("budget_tokens"),
        when(col("tokens_total") <= col("budget_tokens"), 1000000L)
          .otherwise(floor(lit(1000000.0) * col("budget_tokens") / col("tokens_total"))
            .cast("long")).as("rate_e6"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"))
      .orderBy(col("lang"))
  }

  /**
   * The COMPOSED curation pipeline under one gate: quality funnel -> token-budget
   * mix over the SURVIVORS (budgets re-derived from the filtered corpus — the
   * honest pipeline order; deriving them from the raw corpus would over-allocate
   * langs whose documents the funnel rejects) -> sequence packing of the mixed
   * set into training context windows. Every stage is individually gated
   * elsewhere; this query pins the HAND-OFFS (id semantics, re-derived budgets,
   * pack ordering) with a single value hash.
   *
   * Scale: three shuffle-free filter scans + the two bounded driver folds
   * (budget table, pack offsets); the only wide ops are the |langs|-key and
   * per-chunk aggregations. A production run materializes each stage through the
   * snapshot protocol for lineage (the per-stage operators already support it);
   * composing lazily here keeps the gate honest about the pure dataflow.
   */
  def curatePipeline(documents: DataFrame): DataFrame = {
    // checkpointed stage islands: the totals collect, seqPack's max/offsets folds,
    // and the final window would otherwise each re-run the upstream filter scans
    // (~3 redundant corpus passes); production materializes stages through the
    // snapshot protocol instead
    val pass = documents.join(
      qualityFilter(documents).filter(col("kept") === 1).select(col("doc_id")),
      Seq("doc_id"), "left_semi")
      .localCheckpoint(eager = false)
    val mixed = documents.join(
      tokenBudgetMix(pass).select(col("doc_id")), Seq("doc_id"), "left_semi")
      .localCheckpoint(eager = false)
    Packing.seqPack(mixed)
  }

  // ---- per-source quota ----------------------------------------------------------

  /** Salt for the quota draw — independent of [[MixSalt]]/[[BudgetSalt]] so quota
    * survival never correlates with mix membership. */
  val QuotaSalt = "graft-quota-v1"

  /** Documents kept per `source` (C4/RefinedWeb-style domain cap: no single crawl
    * domain may dominate the training set no matter how many pages it contributed). */
  val SourceQuota = 15L

  /** Chunk fan-out for the two-stage rank (output-invariant; QuotaSpec proves 1/7/64
    * agree). Sized so chunk ~ quota at production scale: survivors per source are
    * bounded by QuotaChunks·SourceQuota. */
  val QuotaChunks = 16

  /** Quota priority: first 8 hex chars of md5(salt:doc_id) — same portable
    * uniform-u32-as-lowercase-hex trick as the samplers, so DuckDB ranks by the
    * identical key. doc_id breaks (astronomically unlikely) 8-hex ties. */
  private def quotaKey(docId: Column): Column =
    substring(md5(concat_ws(":", lit(QuotaSalt), docId.cast("string"))), 1, 8)

  /**
   * Per-source document QUOTA: keep at most [[SourceQuota]] documents per `source`,
   * selected by deterministic hash priority (lowest [[quotaKey]] wins) — the domain
   * cap every web-scale curation recipe applies before mixing, with reproducible,
   * oracle-predictable membership instead of a seed-lost random draw. Output
   * (doc_id, source, sample_key, quota_rank), ranks 1..Q per source.
   *
   * Scale shape: an exact per-key top-Q, NOT one window over each source — a
   * mega-source (a 10⁸-page crawl domain) would pin a single sort task. Stage 1
   * ranks within (source, chunk) — [[QuotaChunks]] bounded tasks per source — and
   * keeps local rank <= Q, which provably contains the global top-Q (any global
   * winner ranks <= Q in its own chunk); stage 2 re-ranks only the <= chunks·Q
   * survivors per source. Both windows shuffle O(survivors + corpus/chunks)
   * per task, never O(mega-source). The same two-stage shape as the sessionize
   * bot-tail salting, here for top-K instead of gap sessions.
   */
  def sourceQuota(documents: DataFrame,
      quota: Long = SourceQuota, nChunks: Int = QuotaChunks): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyed = documents.select(col("doc_id"), col("source"),
      quotaKey(col("doc_id")).as("sample_key"),
      pmod(hash(col("doc_id")), lit(nChunks)).as("chunk"))
    val local = Window.partitionBy(col("source"), col("chunk"))
      .orderBy(col("sample_key"), col("doc_id"))
    val survivors = keyed
      .withColumn("lr", row_number().over(local))
      .filter(col("lr") <= quota)
      .drop("lr", "chunk")
    val global = Window.partitionBy(col("source"))
      .orderBy(col("sample_key"), col("doc_id"))
    survivors
      .withColumn("quota_rank", row_number().over(global).cast("long"))
      .filter(col("quota_rank") <= quota)
      .orderBy(col("doc_id"))
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
    // the SAME metric expressions the published quality table uses — single-sourced
    // in TextAnalysis.qualityMetrics so thresholds and metrics cannot drift
    val m = TextAnalysis.qualityMetrics(col("text"))
    val stage = when(m.nTok < MinTokens, FunnelStages(0))
      .when(m.richnessE6 < MinRichnessE6, FunnelStages(1))
      .when(m.stopRatioE6 > MaxStopRatioE6, FunnelStages(2))
      .when(m.nStop === 0L, FunnelStages(3))
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
