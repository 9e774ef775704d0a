package graft.functions

import graft.operators.Curation

/** DuckDB mirrors for the curation operators ([[graft.operators.Curation]]).
  *
  * Every rate/threshold interpolates from the Scala constants — the CASE chain, the
  * hex thresholds, and the stage labels cannot drift from the Spark side. The
  * sampling rule is portable by construction: lowercase-hex md5 on both engines, and
  * an 8-char hex substring compared lexicographically is a uniform-u32 comparison. */
object OracleSqlCuration {

  private def keyExpr: String =
    s"substr(md5('${Curation.MixSalt}:' || CAST(doc_id AS VARCHAR)), 1, 8)"

  val sampleStratified: String = {
    val cases = Curation.MixRates.map { case (lang, rate) =>
      val cond =
        if (rate >= 1.0) "TRUE"
        else s"$keyExpr < '${Curation.thresholdHex(rate)}'"
      s"WHEN lang = '$lang' THEN $cond"
    }.mkString("\n       |            ")
    s"""SELECT doc_id, lang, $keyExpr AS sample_key
       |FROM documents
       |WHERE CASE $cases
       |            ELSE $keyExpr < '${Curation.thresholdHex(Curation.MixDefaultRate)}'
       |       END
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirror of [[Curation.sourceQuota]]: one row_number per source ordered by the
    * salted md5 priority (+ doc_id tie-break), kept iff <= quota. The Spark side's
    * two-stage chunked rank is provably equal to this single global rank (stage 1
    * only discards rows that cannot be in the top Q), so the oracle pins the exact
    * per-domain membership AND rank. */
  val sourceQuota: String =
    s"""WITH k AS (
       |  SELECT doc_id, source,
       |         substr(md5('${Curation.QuotaSalt}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
       |  FROM documents
       |)
       |SELECT doc_id, source, sample_key,
       |       CAST(row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS BIGINT) AS quota_rank
       |FROM k
       |QUALIFY quota_rank <= ${Curation.SourceQuota}
       |ORDER BY doc_id""".stripMargin

  val corpusStats: String =
    """WITH t AS (
      |  SELECT lang, source, len(string_split(text, ' ')) AS n_tok, n_chars
      |  FROM documents
      |),
      |n AS (SELECT count(*) AS total FROM documents)
      |SELECT lang, source,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |       CAST(sum(n_chars) AS BIGINT) AS n_chars,
      |       CAST(min(n_tok) AS BIGINT) AS min_tokens,
      |       CAST(max(n_tok) AS BIGINT) AS max_tokens,
      |       CAST(floor(1000000.0 * count(*) / any_value(n.total)) AS BIGINT) AS share_e6
      |FROM t, n
      |GROUP BY lang, source
      |ORDER BY lang, source""".stripMargin

  private def stageCtes: String = {
    val st = Curation.FunnelStages
    s"""WITH m AS (
       |  SELECT doc_id,
       |         len(string_split(text, ' ')) AS n_tok,
       |         len(list_distinct(string_split(text, ' '))) AS n_dist,
       |         len(list_filter(string_split(text, ' '),
       |             x -> x IN ('${graft.operators.TextAnalysis.Stopwords.mkString("','")}'))) AS n_stop
       |  FROM documents
       |),
       |v AS (
       |  SELECT doc_id,
       |         CASE WHEN n_tok < ${Curation.MinTokens} THEN '${st(0)}'
       |              WHEN CAST(floor(1000000.0 * n_dist / n_tok) AS BIGINT) < ${Curation.MinRichnessE6} THEN '${st(1)}'
       |              WHEN CAST(floor(1000000.0 * n_stop / n_tok) AS BIGINT) > ${Curation.MaxStopRatioE6} THEN '${st(2)}'
       |              WHEN n_stop = 0 THEN '${st(3)}'
       |              ELSE '${st(4)}' END AS stage
       |  FROM m
       |)""".stripMargin
  }

  val qualityFilter: String =
    s"""$stageCtes
       |SELECT doc_id, stage,
       |       CAST(CASE WHEN stage = '${Curation.FunnelStages.last}' THEN 1 ELSE 0 END AS INT) AS kept
       |FROM v ORDER BY doc_id""".stripMargin

  val qualityFunnel: String = {
    val dim = Curation.FunnelStages.zipWithIndex
      .map { case (s, i) => s"($i, '$s')" }.mkString(", ")
    s"""$stageCtes,
       |dim(stage_idx, stage) AS (SELECT * FROM (VALUES $dim)),
       |c AS (SELECT stage, CAST(count(*) AS BIGINT) AS n_docs FROM v GROUP BY stage),
       |n AS (SELECT count(*) AS total FROM documents)
       |SELECT CAST(dim.stage_idx AS INT) AS stage_idx, dim.stage,
       |       coalesce(c.n_docs, 0) AS n_docs,
       |       CAST(floor(1000000.0 * coalesce(c.n_docs, 0) / n.total) AS BIGINT) AS share_e6
       |FROM dim LEFT JOIN c ON dim.stage = c.stage, n
       |ORDER BY stage_idx""".stripMargin
  }

  /** Shared CTE chain for the token-budget mix: measured per-lang token totals ->
    * budget arithmetic -> hex thresholds -> deterministic membership. Every numeric
    * step mirrors Curation.budgetTable's single IEEE double ops (shares are CAST to
    * DOUBLE — DuckDB would otherwise parse 0.35 as DECIMAL and change the rounding);
    * printf('%08x', ...) emits the same lowercase zero-padded threshold the Scala
    * thresholdHex produces. thrhex IS NULL encodes keep-all (lang under budget). */
  private def budgetCtes: String = "WITH " + budgetChain("documents")

  /** The budget chain with a parameterized source (so the composed pipeline can
    * run it over the funnel's survivors instead of the raw corpus). */
  private def budgetChain(src: String): String = {
    val shares = Curation.BudgetShares
      .map { case (l, s) => s"('$l', CAST($s AS DOUBLE))" }.mkString(", ")
    s"""tk AS (
       |  SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
       |  FROM $src
       |),
       |tot AS (SELECT lang, CAST(sum(n_tok) AS BIGINT) AS t FROM tk GROUP BY lang),
       |bt AS (SELECT CAST(floor(CAST(${Curation.BudgetFrac} AS DOUBLE) * sum(t)) AS BIGINT) AS budget_total FROM tot),
       |shares(lang, share) AS (SELECT * FROM (VALUES $shares)),
       |thr AS (
       |  SELECT tot.lang, tot.t,
       |         CAST(floor(bt.budget_total * coalesce(s.share, CAST(0.0 AS DOUBLE))) AS BIGINT) AS b,
       |         CASE WHEN tot.t <= CAST(floor(bt.budget_total * coalesce(s.share, CAST(0.0 AS DOUBLE))) AS BIGINT)
       |              THEN NULL
       |              ELSE printf('%08x', CAST(least(floor((CAST(CAST(floor(bt.budget_total * coalesce(s.share, CAST(0.0 AS DOUBLE))) AS BIGINT) AS DOUBLE)
       |                   / tot.t) * 4294967296.0), 4294967295.0) AS BIGINT)) END AS thrhex
       |  FROM tot LEFT JOIN shares s ON s.lang = tot.lang, bt
       |),
       |keyd AS (
       |  SELECT doc_id, lang, n_tok,
       |         substr(md5('${Curation.BudgetSalt}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sample_key
       |  FROM tk
       |),
       |kept AS (
       |  SELECT k.doc_id, k.lang, k.n_tok, k.sample_key
       |  FROM keyd k JOIN thr ON thr.lang = k.lang
       |  WHERE thr.b > 0 AND (thr.thrhex IS NULL OR k.sample_key < thr.thrhex)
       |)""".stripMargin
  }

  /** Mirror of Curation.tokenBudgetMix: exact deterministic membership. */
  val tokenBudgetMix: String =
    s"""$budgetCtes
       |SELECT doc_id, lang, n_tok, sample_key FROM kept ORDER BY doc_id""".stripMargin

  /** Mirror of Curation.tokenBudgetStats: realized-vs-target mixing report. */
  val tokenBudgetStats: String =
    s"""$budgetCtes,
       |ka AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
       |         CAST(sum(n_tok) AS BIGINT) AS kept_tokens
       |  FROM kept GROUP BY lang
       |)
       |SELECT thr.lang, thr.t AS tokens_total, thr.b AS budget_tokens,
       |       CAST(CASE WHEN thr.t <= thr.b THEN 1000000
       |            ELSE floor(1000000.0 * thr.b / thr.t) END AS BIGINT) AS rate_e6,
       |       coalesce(ka.n_kept, 0) AS n_kept,
       |       coalesce(ka.kept_tokens, 0) AS kept_tokens
       |FROM thr LEFT JOIN ka ON ka.lang = thr.lang
       |ORDER BY thr.lang""".stripMargin

  /** Mirror of Curation.curatePipeline: funnel-pass -> token-budget mix over the
    * SURVIVORS (budgets re-derived from the filtered corpus's measured totals) ->
    * sequence packing of the mixed set. One value hash over the composed pipeline:
    * a regression in any stage, or in how the stages hand off, mismatches. */
  val curatePipeline: String = {
    val cap = graft.operators.Packing.Capacity
    s"""$stageCtes,
       |pass AS (
       |  SELECT d.doc_id, d.lang, d.text
       |  FROM documents d JOIN v ON v.doc_id = d.doc_id
       |  WHERE v.stage = '${Curation.FunnelStages.last}'
       |),
       |${budgetChain("pass")},
       |cum AS (
       |  SELECT doc_id, n_tok AS n_tokens,
       |         CAST(coalesce(sum(n_tok) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM kept
       |)
       |SELECT doc_id, n_tokens,
       |       CAST(cum_before // $cap AS BIGINT) AS start_window,
       |       CAST((cum_before + n_tokens - 1) // $cap AS BIGINT) AS end_window,
       |       CAST(cum_before % $cap AS BIGINT) AS start_offset
       |FROM cum ORDER BY doc_id""".stripMargin
  }

  /** Mirror of Packing.seqPack: exclusive prefix sum of token counts in doc_id
    * order, then integer window arithmetic at [[graft.operators.Packing.Capacity]]
    * tokens (DuckDB `//` = Spark `DIV`; both sides stay in BIGINT — no double
    * division anywhere). The oracle's single ORDER BY window is the semantic spec;
    * the Spark side reaches the same sum with the two-level bucket scan. */
  val seqPack: String = {
    val cap = graft.operators.Packing.Capacity
    s"""WITH tk AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents
       |),
       |cum AS (
       |  SELECT doc_id, n_tokens,
       |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM tk
       |)
       |SELECT doc_id, n_tokens,
       |       CAST(cum_before // $cap AS BIGINT) AS start_window,
       |       CAST((cum_before + n_tokens - 1) // $cap AS BIGINT) AS end_window,
       |       CAST(cum_before % $cap AS BIGINT) AS start_offset
       |FROM cum ORDER BY doc_id""".stripMargin
  }

  /** Mirror of Packing.seqPackShuffled: the same chunking over the md5-permuted
    * order (sort_key, doc_id). The oracle's single ORDER BY window is the semantic
    * spec; the Spark side reaches the same sums via leading-nibble hash-range
    * buckets. sort_key rides in the output so the realized ORDER is hashed too. */
  val seqPackShuffled: String = {
    val cap = graft.operators.Packing.Capacity
    s"""WITH tk AS (
       |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       |         substr(md5('${graft.operators.Packing.ShuffleSalt}:' || CAST(doc_id AS VARCHAR)), 1, 8) AS sort_key
       |  FROM documents
       |),
       |cum AS (
       |  SELECT doc_id, n_tokens, sort_key,
       |         CAST(coalesce(sum(n_tokens) OVER (ORDER BY sort_key, doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
       |  FROM tk
       |)
       |SELECT doc_id, n_tokens, sort_key,
       |       CAST(cum_before // $cap AS BIGINT) AS start_window,
       |       CAST((cum_before + n_tokens - 1) // $cap AS BIGINT) AS end_window,
       |       CAST(cum_before % $cap AS BIGINT) AS start_offset
       |FROM cum ORDER BY doc_id""".stripMargin
  }
}
