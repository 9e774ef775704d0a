package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for a training-data pipeline, over the `documents` table
 * (doc_id, text, lang, source, n_chars). All pure Catalyst expressions — no UDFs, no
 * shuffles except the stated aggregations — so every operator whole-stage-codegens and
 * scales linearly with input splits.
 *
 * Ratio columns are surfaced as floor(1e6 * num / den) BIGINT to keep the DuckDB oracle
 * comparison exact (identical IEEE double ops on both sides, no rounding-mode trap).
 */
object TextAnalysis {

  private def toks(c: Column): Column = split(c, " ")

  /** Stopword set used by quality scoring (must stay in sync with OracleSql). */
  val Stopwords = Seq("the", "a", "of", "and", "key", "data")

  /** Marker-word lists for the n-gram lang-ID heuristic — single-sourced: the
    * oracle SQL interpolates these, so a tuning change cannot desync the gate. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "key", "row"),
    "de" -> Seq("der", "die", "und", "table"),
    "es" -> Seq("el", "la", "de", "query"),
    "fr" -> Seq("le", "les", "et", "merge"))

  /** The shared exact-integer quality metric columns over the standard whitespace
    * tokenization — the single source for [[quality]] AND the curation funnel
    * ([[Curation.qualityFilter]]): a tokenization or flooring change in one place
    * must never silently desync the published metrics from the filter thresholds. */
  final case class QualityMetrics(nTok: Column, nDist: Column, nStop: Column,
      richnessE6: Column, stopRatioE6: Column)

  def qualityMetrics(text: Column): QualityMetrics = {
    val t = toks(text)
    val nTok = size(t).cast("long")
    val nDist = size(array_distinct(t)).cast("long")
    val nStop = size(filter(t, x => x.isin(Stopwords: _*))).cast("long")
    QualityMetrics(nTok, nDist, nStop,
      floor(lit(1000000.0) * nDist / nTok).cast("long"),
      floor(lit(1000000.0) * nStop / nTok).cast("long"))
  }

  /** Per-document quality metrics: token counts, vocabulary richness, stopword ratio,
    * average token length. */
  def quality(documents: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val m = qualityMetrics(col("text"))
    val (nTok, nDist) = (m.nTok, m.nDist)
    val tokChars = aggregate(t, lit(0L), (acc, x) => acc + length(x)).cast("long")
    documents.select(
      col("doc_id"),
      length(col("text")).cast("long").as("n_chars_m"),
      nTok.as("n_tokens"),
      nDist.as("n_distinct"),
      m.richnessE6.as("richness_e6"),
      m.stopRatioE6.as("stop_ratio_e6"),
      floor(lit(1000000.0) * tokChars / nTok).cast("long").as("avg_tok_len_e6")
    ).orderBy(col("doc_id"))
  }

  /** Marker-word language-ID heuristic. Ties break in fixed order en>de>es>fr (nested
    * CASE, deterministic). Synthetic corpus vocabulary is English-ish for every lang, so
    * accuracy is low by construction — the operator contract is what's verified. */
  def langId(documents: DataFrame): DataFrame = {
    val t = toks(col("text"))
    def score(markers: Seq[String]): Column =
      size(filter(t, x => x.isin(markers: _*))).cast("long")
    val m = LangMarkers.toMap
    val sEn = score(m("en"))
    val sDe = score(m("de"))
    val sEs = score(m("es"))
    val sFr = score(m("fr"))
    val pred = when(sDe > sEn && sDe >= sEs && sDe >= sFr, "de")
      .when(sEs > sEn && sEs >= sFr, "es")
      .when(sFr > sEn, "fr")
      .otherwise("en")
    documents.select(
      col("doc_id"), col("lang"),
      sEn.as("s_en"), sDe.as("s_de"), sEs.as("s_es"), sFr.as("s_fr"),
      pred.as("pred_lang"),
      when(pred === col("lang"), 1).otherwise(0).as("correct")
    ).orderBy(col("doc_id"))
  }

  /** Token statistics incl. a BPE-ish subword estimate (ceil(len/4) per token). */
  def tokenStats(documents: DataFrame): DataFrame = {
    val t = toks(col("text"))
    documents.select(
      col("doc_id"),
      size(t).cast("long").as("n_tokens"),
      size(array_distinct(t)).cast("long").as("n_distinct"),
      array_max(transform(t, x => length(x))).cast("long").as("max_tok_len"),
      aggregate(t, lit(0L), (acc, x) => acc + floor((length(x) + 3) / lit(4.0)).cast("long"))
        .as("n_subwords")
    ).orderBy(col("doc_id"))
  }

  /** Quantile points reported by [[tokenQuantiles]] (percent, integer). */
  val QuantilePoints = Seq(25, 50, 75, 90, 99)

  /**
   * EXACT per-lang quantiles of the document token count (the length-distribution
   * row of a dataset card: median/p90/p99 doc length per language), computed the
   * scale-right way for an integer-valued metric: HISTOGRAM + CUMULATIVE WINDOW,
   * never a per-group sort of the corpus.
   *
   *   1. histogram: groupBy(lang, n_tokens) count — map-side partial agg over
   *      BOUNDED keys (|langs| x |distinct lengths|, independent of corpus rows);
   *   2. cumulative counts: one window over the histogram (10^3-10^5 rows total);
   *   3. quantile q = the smallest value whose cumulative count reaches
   *      ceil(q*n/100) (inverted-CDF / type-1 convention, pinned by QuantileSpec's
   *      single-threaded oracle) — extracted by joining the quantile dimension
   *      against the cumulative histogram, all arithmetic BIGINT DIV (a double
   *      division would lose exactness past 2^53 at trillion-doc scale).
   *
   * The alternative everyone reaches for — `percentile` / `Window.orderBy(v)` over
   * the raw rows — sorts the full corpus per group; `approx_percentile` gives up
   * exactness. On a bounded integer domain the histogram IS the exact sufficient
   * statistic, at one map-side-combine shuffle.
   *
   * Output: (lang, q, n_docs, value) — all BIGINT but lang, ordered (lang, q).
   */
  def tokenQuantiles(documents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = documents
      .select(col("lang"), qualityMetrics(col("text")).nTok.as("v"))
      .groupBy(col("lang"), col("v")).agg(count(lit(1)).as("cnt"))
    val cum = hist.withColumn("cum",
      sum(col("cnt")).over(Window.partitionBy(col("lang")).orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val qs = hist.groupBy(col("lang")).agg(sum(col("cnt")).as("n_docs"))
      .select(col("lang"), col("n_docs"),
        explode(lit(QuantilePoints.map(_.toLong).toArray)).as("q"))
    qs.join(cum, Seq("lang"))
      .filter(col("cum") >= expr("(q * n_docs + 99) DIV 100"))
      .groupBy(col("lang"), col("q"), col("n_docs"))
      .agg(min(col("v")).as("value"))
      .select(col("lang"), col("q"), col("n_docs"), col("value"))
      .orderBy(col("lang"), col("q"))
  }

  /** Corpus term statistics: (term, df, cf) — document frequency and corpus frequency
    * in one exploded aggregation (the vocabulary/inverted-index building block of a
    * pretraining pipeline). One shuffle on the term; uniform by construction. */
  def termDf(documents: DataFrame): DataFrame =
    documents
      .select(col("doc_id"), explode(toks(col("text"))).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"), count(lit(1)).as("cf"))
      .orderBy(col("term"))

  /** tf-table format version — part of the committed-table directory key (see
    * [[graft.sources.TableSnapshot]]'s staleness contract); bump with any change to
    * tokenization or the tf schema. */
  val TfFormatVersion = 1

  /** Terms kept per document by [[topTerms]] (oracle-interpolated). */
  val TopTermsK = 3

  /** Bucket count for the committed tf table (matches [[Dedup.SigBuckets]] logic:
    * derived tables are cheap per bucket, so finer resume granularity is free). */
  val TfBuckets = 16

  /** Top-k salient terms per document by an EXACT-rational tf-idf-style score:
    * score_e6 = floor(1e6 * tf * N / (df * n_tokens_doc)) — pure integer arithmetic,
    * so the DuckDB mirror matches bit-for-bit (a log-based idf would hit last-ulp
    * divergence between libm implementations). Ties break on the term.
    *
    * tf is consumed twice (df derivation + the scoring join), so it is materialized
    * once. With `tfStore` set (the registered/production form) it is committed through
    * the snapshot protocol — durable parquet with manifest lineage, reruns skip
    * verified buckets (VERDICT r3 #4); the caller must key the directory by corpus
    * fingerprint + [[TfFormatVersion]]. Without it (ad-hoc/test form) it is lazily
    * localCheckpoint-ed: executor-local blocks, fine on one machine. */
  def topTerms(documents: DataFrame, k: Int = TopTermsK,
      tfStore: Option[String] = None): DataFrame = {
    val n = documents.count() // corpus size: one tiny job, broadcast as a literal
    val tfRaw = documents
      .select(col("doc_id"), size(toks(col("text"))).cast("long").as("dl"),
        explode(toks(col("text"))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val tf = tfStore match {
      // metadata-tier verification only on this READ path (runHashBucketed's
      // default: the deep re-hash of every committed byte is an explicit audit,
      // not a per-query cost)
      case Some(dir) =>
        graft.sources.TableSnapshot.runHashBucketed(tfRaw, "doc_id", dir, TfBuckets)
      case None => tfRaw.localCheckpoint(eager = false)
    }
    // tf is DISTINCT on (doc_id, term) by construction (it is grouped on them), so
    // document frequency is a plain count — a countDistinct here would pay a second
    // hash-distinct pass over the whole tf table for nothing (VERDICT r3 #3)
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    // bounded per-doc top-k via TermTopKAgg (map-side partials, no sort) — a
    // row_number().over(Window.partitionBy(doc_id)) plan would shuffle AND sort
    // every (doc, term) pair to keep 3 of them (same argument as Similarity.annTopK)
    val topk = udaf(new TermTopKAgg(k))
    tf.join(df, Seq("term"))
      .withColumn("score_e6",
        floor(lit(1000000.0) * col("tf") * lit(n) / (col("df") * col("dl")))
          .cast("long"))
      .groupBy(col("doc_id"))
      .agg(topk(col("score_e6"), col("term"), col("tf"), col("df")).as("tk"))
      .select(col("doc_id"), posexplode(col("tk.items")))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("rk"), col("col.term"),
        col("col.tf"), col("col.df"), col("col.score_e6"))
      .orderBy(col("doc_id"), col("rk"))
  }

  /** Word n-gram shingles of the text, as raw joined strings. */
  def shingles(text: Column, n: Int): Column = {
    val t = toks(text)
    transform(
      sequence(lit(0), greatest(lit(0), size(t) - n)),
      i => concat_ws(" ", slice(t, i + 1, lit(n))))
  }

  /** Rolling-hash document fingerprint: lexicographic-min md5 over 5-gram shingles
    * (winnowing-lite; one deterministic representative per document). Native one-pass
    * expression ([[graft.functions.FingerprintExpr]]). */
  def fingerprint(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        graft.functions.FingerprintExpr(col("text")).as("f"))
      .select(col("doc_id"), col("f.fp").as("fp"), col("f.n_shingles").as("n_shingles"))
      .orderBy(col("doc_id"))

  /** Deterministic Unicode-noise suffix: the three failure classes
    * [[normalizeText]] canonicalizes — decomposed (e+U+0301) vs precomposed
    * (U+00C9/U+00E9) forms, the whitespace zoo (NBSP, ideographic/thin space,
    * zero-width space, tabs, CRLF, runs), mixed case, AND the two characters where
    * full and simple Unicode lowercasing diverge (dotted capital I U+0130,
    * word-final capital sigma U+03A3 — [[graft.functions.TextNormalizeImpl]]
    * explains why simple mapping is the contract). Mirrored BYTE-exactly in
    * the DuckDB oracle ([[graft.functions.OracleSqlText.UnicodeNoise]]). */
  val UnicodeNoise: String =
    " Cafe\u0301 CAF\u00C9\u00A0joined\u3000wide\u2009thin zero\u200Bwidth\tTAB" +
    "  Twice \u0130stanbul \u039F\u03A3\r\n" // U+0130/U+03A3: simple-vs-full case traps

  /** Unicode-noise mutant selector and id stride — interpolated into the DuckDB
    * mirror (OracleSqlText.normalizeText), never hand-duplicated (ADVICE r4's
    * literal-hygiene sweep). */
  val NoiseMod = 7
  val NoiseStride = 500000L

  /** documents + Unicode-noised copies of every [[NoiseMod]]th doc
    * (id + [[NoiseStride]]). */
  def withUnicodeNoise(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text")).unionByName(
      documents.filter(col("doc_id") % NoiseMod === 0)
        .select((col("doc_id") + NoiseStride).as("doc_id"),
          concat(col("text"), lit(UnicodeNoise)).as("text")))

  /** Canonical normalization (NFC -> whitespace collapse -> trim -> lower; see
    * [[graft.functions.TextNormalizeImpl]]) with a changed flag — shuffle-free,
    * one codegen'd pass per row. */
  def normalizeText(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
        graft.functions.NormalizeTextExpr(col("text")).as("norm_text"),
        col("text"))
      .select(col("doc_id"), col("norm_text"),
        when(col("norm_text") =!= col("text"), 1).otherwise(0).as("changed"))
      .orderBy(col("doc_id"))

  // ------------------------------------------------------------------------------
  // Character-trigram LM fluency scoring (the CCNet/Gopher "perplexity filter" slot)
  // ------------------------------------------------------------------------------

  /** Probability scale for the trigram model (floor(1e6 * c_tri / c_bi)). */
  val LmProbScale = 1000000L

  /** LM-model committed-table format version + bucket count (TableSnapshot key
    * discipline — bump the version with any change to trigram extraction or the
    * smoothing formula). The model is tiny (charset-bounded), so few buckets. */
  val LmFormatVersion = 1
  val LmBuckets = 4

  /** Character trigrams of the text, all occurrences in order. Spark's
    * sequence(1, 0) DESCENDS (it is not empty!), so short strings are guarded to
    * an empty array — the DuckDB mirror's generate_series(1, 0) is empty natively. */
  def charTrigrams(text: Column): Column =
    when(length(text) >= 3,
      transform(sequence(lit(1), length(text) - 2), i => text.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  /**
   * The trigram LANGUAGE MODEL: Witten-Bell-smoothed conditional probability of
   * each corpus trigram given its 2-char prefix, as an exact scaled integer
   * p_e6(tri) = (count(tri) * 1e6) DIV (count(context) + types(context)), where
   * types(context) is the number of DISTINCT trigrams continuing that prefix.
   * Context counts are derived FROM the trigram table (sum of trigram counts per
   * prefix), so the conditional is well-formed by construction (no end-of-string
   * bigram skew). The type-count discount matters: the UNsmoothed ratio assigns
   * probability 1.0 to any singleton trigram whose context is also a singleton, so
   * a document of pure novelty would score as maximally fluent — with the escape
   * mass, singleton evidence caps at 1/2 while genuinely repeated continuations
   * approach c/(c+1) (TextModelSpec pins the ranking).
   *
   * Model size is charset-bounded (|Σ|³ rows — tens of thousands for web text after
   * normalization), so it broadcasts at any corpus scale; building it is one
   * map-side-partial count over the trigram stream. Production shape: train on a
   * sample or a trusted subcorpus, COMMIT through the snapshot protocol (the
   * TableSnapshot pattern dedup signatures use), then score any corpus against the
   * committed model — [[lmScore]]'s self-trained form keeps the whole trajectory
   * under the DuckDB gate instead.
   */
  def lmModel(documents: DataFrame): DataFrame = {
    // native one-pass per-doc trigram TF (graft.functions.TrigramTfExpr): the agg
    // sees |distinct tris| rows per doc instead of |chars| — Σcnt == the
    // occurrence count, so all arithmetic and oracles are unchanged
    val cTri = documents
      .select(explode(graft.functions.TrigramTfExpr(col("text"))).as("tc"))
      .groupBy(col("tc.tri").as("tri")).agg(sum(col("tc.cnt")).as("c_tri"))
    val cBi = cTri.groupBy(substring(col("tri"), 1, 2).as("bi"))
      .agg(sum(col("c_tri")).as("c_bi"), count(lit(1)).as("t_bi"))
    cTri.join(cBi, substring(col("tri"), 1, 2) === col("bi"))
      .select(col("tri"),
        expr(s"(c_tri * $LmProbScale) DIV (c_bi + t_bi)").as("p_e6"))
  }

  /**
   * Per-document LM fluency score — the quality signal perplexity filtering keys on
   * (CCNet buckets corpora by LM perplexity; Gopher uses it as a quality prior).
   * score_e6 = floor(mean over trigram tokens of p_e6(tri)): arithmetic-mean
   * conditional probability, the deterministic-integer proxy for (negated)
   * perplexity — boilerplate/templated text scores HIGH (predictable trigrams),
   * lorem-noise scores LOW. No logs anywhere: log/exp round differently across
   * engines, so the geometric form stays test-only while the gate pins this one
   * bit-for-bit.
   *
   * Two corpus passes (model, then score), each one map-side-partial shuffle; the
   * scoring join is broadcast (model is charset-bounded). At 10^12 docs the model
   * pass runs over a sample (or reads the committed model) and scoring stays a
   * single broadcast-join scan. With `modelStore` set (the registered form) the
   * model is committed through the snapshot protocol (TableSnapshot, keyed by
   * corpus fingerprint + [[LmFormatVersion]]): the training pass runs once per
   * corpus; re-scores — and every downstream corpus scored against the same model —
   * read the committed table instead of re-counting trigrams.
   */
  def lmScore(documents: DataFrame, modelStore: Option[String] = None): DataFrame = {
    val model = modelStore match {
      case Some(dir) =>
        graft.sources.TableSnapshot.runHashBucketed(lmModel(documents), "tri", dir, LmBuckets)
      case None => lmModel(documents)
    }
    // LEFT join + coalesce(0), though inner would gate identically on the
    // self-trained registered form: against a model committed from a DIFFERENT
    // corpus (the advertised production shape) an inner join silently drops
    // unseen trigrams — novel text would score HIGHER (mean over known trigrams
    // only) and all-novel docs would vanish; unseen-means-0 is the Witten-Bell
    // escape-mass reading and keeps the score a mean over ALL of the doc's
    // trigrams (dsirWeights' target side makes the same move)
    documents
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TrigramTfExpr(col("text"))).as("tc"))
      .join(broadcast(model), col("tc.tri") === col("tri"), "left")
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tc.cnt")).as("n_tris"),
        sum(col("tc.cnt") * coalesce(col("p_e6"), lit(0L))).as("p_sum"))
      .select(col("doc_id"), col("lang"), col("n_tris"),
        expr("p_sum DIV n_tris").as("score_e6"))
      .orderBy(col("doc_id"))
  }

  /** DSIR target selector (the trusted/target distribution is played by the 'en'
    * subcorpus) and the resampling salt — both interpolated into the oracle. */
  val DsirTargetLang = "en"
  val DsirSampleSalt = "dsir1"

  /**
   * DSIR — Data Selection via Importance Resampling (Xie et al. 2023), the
   * n-gram-LM data-selection method: weight every document by how much more
   * target-like than source-like its text is, then resample proportionally.
   * Deterministic-integer variant of the paper's hashed-ngram form, composed
   * entirely from machinery already under the gate:
   *  - target model = [[lmModel]] over the target subcorpus (lang =
   *    [[DsirTargetLang]]); source model = [[lmModel]] over the full corpus —
   *    both charset-bounded, both broadcast;
   *  - per-doc scores are the same arithmetic-mean trigram probabilities as
   *    [[lmScore]] (a trigram ABSENT from the target model contributes 0 —
   *    out-of-target text is penalized exactly where the paper's log-ratio
   *    goes negative);
   *  - weight_e6 = (t_score_e6 · 1e6) DIV max(s_score_e6, 1), and `sampled` keeps
   *    the doc with probability min(weight, 1) via the same portable
   *    md5-threshold trick the curation samplers use (u32 % 1e6 < weight_e6) —
   *    reproducible membership, re-rolled globally by bumping the salt.
   *
   * One corpus scan for the scoring pass (both model joins broadcast), two tiny
   * model passes; at 10^12 docs the models train on samples / committed tables
   * exactly like [[lmScore]]'s production shape. With the store params set (the
   * registered form) both models route through TableSnapshot — and the SOURCE
   * model is the SAME committed artifact `lm_score` trains (same directory key),
   * the one-model-many-consumers shape a production curation stack runs.
   */
  def dsirWeights(documents: DataFrame, sourceStore: Option[String] = None,
      targetStore: Option[String] = None): DataFrame = {
    import graft.functions.PortableHash.md5u32
    def committed(m: => DataFrame, store: Option[String]): DataFrame = store match {
      case Some(dir) =>
        graft.sources.TableSnapshot.runHashBucketed(m, "tri", dir, LmBuckets)
      case None => m
    }
    val target = broadcast(
      committed(lmModel(documents.filter(col("lang") === DsirTargetLang)), targetStore)
        .select(col("tri").as("t_tri"), col("p_e6").as("pt_e6")))
    val source = broadcast(
      committed(lmModel(documents), sourceStore)
        .select(col("tri").as("s_tri"), col("p_e6").as("ps_e6")))
    documents
      .select(col("doc_id"), col("lang"),
        explode(graft.functions.TrigramTfExpr(col("text"))).as("tc"))
      // both LEFT: self-trained source makes inner/left identical, but against a
      // committed source model from another corpus an inner join would drop
      // unseen trigrams from BOTH sums (see lmScore's scaladoc)
      .join(source, col("tc.tri") === col("s_tri"), "left")
      .join(target, col("tc.tri") === col("t_tri"), "left") // absent => contributes 0
      .groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("tc.cnt")).as("n_tris"),
        sum(col("tc.cnt") * coalesce(col("pt_e6"), lit(0L))).as("t_sum"),
        sum(col("tc.cnt") * coalesce(col("ps_e6"), lit(0L))).as("s_sum"))
      .select(col("doc_id"), col("lang"), col("n_tris"),
        expr("t_sum DIV n_tris").as("t_score_e6"),
        expr("s_sum DIV n_tris").as("s_score_e6"))
      .withColumn("weight_e6",
        expr(s"(t_score_e6 * $LmProbScale) DIV greatest(s_score_e6, 1)"))
      .withColumn("sampled",
        (pmod(md5u32(concat_ws(":", lit(DsirSampleSalt), col("doc_id"))),
          lit(LmProbScale)) < least(col("weight_e6"), lit(LmProbScale))).cast("int"))
      .orderBy(col("doc_id"))
  }

  // ------------------------------------------------------------------------------
  // Hashed linear classifier inference (the fastText-quality-filter slot)
  // ------------------------------------------------------------------------------

  /** Feature-hash buckets (2^16) and weight modulus (weights in
    * [-ClsWeightBias, +ClsWeightBias]); the bias centers the modulus range on
    * zero and is derived, never restated (oracle-interpolated). */
  val ClsBuckets = 65536L
  val ClsWeightMod = 2001L
  val ClsWeightBias: Long = (ClsWeightMod - 1) / 2

  /** Weight of one feature: bucket = u32(md5("fh:"||f)) % ClsBuckets, then
    * w = u32(md5("fw:"||bucket)) % ClsWeightMod - 1000. The md5-derived weight
    * vector is a deterministic MODEL-STATE STAND-IN (no trained artifacts exist in
    * this sandbox): a real deployment loads trained weights as a broadcast
    * (bucket, w) table or a literal array — the inference plumbing (feature
    * extraction, hashing, the additive score) is identical and is what this
    * operator puts under the gate. */
  def featureWeight(f: Column): Column = {
    import graft.functions.PortableHash.md5u32
    val bucket = pmod(md5u32(concat(lit("fh:"), f)), lit(ClsBuckets))
    pmod(md5u32(concat(lit("fw:"), bucket.cast("string"))), lit(ClsWeightMod)) -
      ClsWeightBias
  }

  /**
   * Linear classifier INFERENCE over hashed unigram+bigram features — the shape of
   * every fastText-style quality/safety filter applied to a 100-TB corpus: the
   * model is fixed; the engine-side cost is one shuffle-free codegen-friendly pass
   * per document (feature extraction and the weight sum are per-row higher-order
   * functions; nothing is exchanged). label = 1 iff the additive score is
   * positive (the integer margin, not a sigmoid — monotone-identical decision).
   */
  def classifierScore(documents: DataFrame): DataFrame =
    classifierScored(documents).orderBy(col("doc_id"))

  /** [[classifierScore]] without the output ordering: every column is a per-row
    * expression, so this form is streaming-legal in append mode unchanged
    * ([[graft.streaming.StreamingQuality]] runs exactly this over readStream). */
  def classifierScored(documents: DataFrame): DataFrame = {
    val t = toks(col("text"))
    val n = size(t)
    val bigrams = zip_with(slice(t, lit(1), n - 1), slice(t, lit(2), n - 1),
      (a, b) => concat(a, lit("_"), b))
    val feats = concat(t, bigrams)
    documents.select(
        col("doc_id"), col("lang"),
        size(feats).cast("long").as("n_feats"),
        aggregate(feats, lit(0L), (acc, f) => acc + featureWeight(f)).as("score"))
      .withColumn("label", when(col("score") > 0, 1).otherwise(0))
  }
}
