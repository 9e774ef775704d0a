package graft.functions

/** DuckDB oracles for the corpus term-statistics operators
  * ([[graft.operators.TextAnalysis.termDf]] / [[graft.operators.TextAnalysis.topTerms]]).
  * The tf-idf-style score is exact rational arithmetic (one IEEE division of exact
  * integers on both engines), never a log. */
object OracleSqlText {

  /** Mirror of TextAnalysis.normalizeText over withUnicodeNoise. The noise suffix
    * is interpolated from the SAME Scala constant the Spark side appends
    * (byte-exact single-sourcing); the normalization chain maps 1:1 — NFC
    * (nfc_normalize), whitespace-run collapse (RE2 class identical to the
    * java.util.regex class in TextNormalizeImpl), trim (post-collapse the ends can
    * only be ASCII spaces, so trim == strip), lower. */
  val normalizeText: String = {
    import graft.operators.TextAnalysis.{NoiseMod, NoiseStride, UnicodeNoise}
    val norm =
      """lower(trim(regexp_replace(nfc_normalize(text), '[\t\n\x0B\f\r \p{Zs}\x{200B}]+', ' ', 'g')))"""
    s"""WITH ncorpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + $NoiseStride AS doc_id, text || '$UnicodeNoise' AS text
       |  FROM documents WHERE doc_id % $NoiseMod = 0
       |)
       |SELECT doc_id, $norm AS norm_text,
       |       CAST(CASE WHEN $norm <> text THEN 1 ELSE 0 END AS INT) AS changed
       |FROM ncorpus ORDER BY doc_id""".stripMargin
  }

  val termDf: String =
    """WITH tk AS (
      |  SELECT doc_id, t.t AS term
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
      |)
      |SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df,
      |       CAST(count(*) AS BIGINT) AS cf
      |FROM tk GROUP BY term ORDER BY term""".stripMargin

  val topTerms: String =
    s"""WITH tk AS (
      |  SELECT doc_id, len(string_split(text, ' ')) AS dl, t.t AS term
      |  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
      |),
      |tf AS (
      |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM tk GROUP BY doc_id, dl, term
      |),
      |dfx AS (SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term),
      |nn AS (SELECT count(*) AS n FROM documents),
      |sc AS (
      |  SELECT tf.doc_id, tf.term, tf.tf, dfx.df,
      |         CAST(floor((1000000.0 * tf.tf * nn.n) / (dfx.df * tf.dl)) AS BIGINT) AS score_e6
      |  FROM tf, dfx, nn WHERE tf.term = dfx.term
      |),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score_e6 DESC, term) AS rk
      |  FROM sc
      |)
      |SELECT doc_id, CAST(rk AS BIGINT) AS rk, term, tf, df, score_e6
      |FROM ranked WHERE rk <= ${graft.operators.TextAnalysis.TopTermsK}
      |ORDER BY doc_id, rk""".stripMargin

  /** Mirror of TextAnalysis.lmScore: Witten-Bell-smoothed trigram conditionals as
    * scaled integers ((c_tri * 1e6) // (c_bi + types(bi)) with context counts
    * derived from the trigram table), then the per-doc arithmetic-mean
    * probability. generate_series(1, 0) is empty in DuckDB, matching the Spark
    * side's explicit short-string guard. */
  val lmScore: String = {
    val scale = graft.operators.TextAnalysis.LmProbScale
    s"""WITH tg AS (
       |  SELECT doc_id, lang, substr(text, t.i, 3) AS tri
       |  FROM documents, UNNEST(generate_series(1, len(text) - 2)) AS t(i)
       |),
       |ctri AS (SELECT tri, CAST(count(*) AS BIGINT) AS c_tri FROM tg GROUP BY tri),
       |cbi AS (
       |  SELECT substr(tri, 1, 2) AS bi, CAST(sum(c_tri) AS BIGINT) AS c_bi,
       |         CAST(count(*) AS BIGINT) AS t_bi
       |  FROM ctri GROUP BY substr(tri, 1, 2)
       |),
       |model AS (
       |  SELECT tri, (c_tri * $scale) // (c_bi + t_bi) AS p_e6
       |  FROM ctri JOIN cbi ON substr(ctri.tri, 1, 2) = cbi.bi
       |)
       |SELECT tg.doc_id, tg.lang, CAST(count(*) AS BIGINT) AS n_tris,
       |       CAST(CAST(sum(m.p_e6) AS BIGINT) // count(*) AS BIGINT) AS score_e6
       |FROM tg JOIN model m ON tg.tri = m.tri
       |GROUP BY tg.doc_id, tg.lang
       |ORDER BY tg.doc_id""".stripMargin
  }

  /** Mirror of TextAnalysis.classifierScore: hashed unigram+bigram features, the
    * same two-md5 weight derivation ([[PortableHash]]'s u32 trick in its DuckDB
    * form), additive integer margin, threshold label. */
  val classifierScore: String = {
    import graft.operators.TextAnalysis.{ClsBuckets, ClsWeightBias, ClsWeightMod}
    val bucket = PortableHash.u32Sql("'fh:' || f")
    val weight = PortableHash.u32Sql(
      s"'fw:' || CAST($bucket % $ClsBuckets AS VARCHAR)") +
      s" % $ClsWeightMod - $ClsWeightBias"
    s"""WITH tk AS (SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents),
       |ft AS (
       |  SELECT doc_id, lang,
       |         list_concat(t, list_transform(generate_series(1, len(t) - 1),
       |                                       i -> t[i] || '_' || t[i + 1])) AS fs
       |  FROM tk
       |),
       |fx AS (SELECT doc_id, lang, len(fs) AS nf, unnest(fs) AS f FROM ft)
       |SELECT doc_id, lang, CAST(nf AS BIGINT) AS n_feats,
       |       CAST(sum($weight) AS BIGINT) AS score,
       |       CAST(CASE WHEN sum($weight) > 0 THEN 1 ELSE 0 END AS INT) AS label
       |FROM fx GROUP BY doc_id, lang, nf
       |ORDER BY doc_id""".stripMargin
  }

  /** Mirror of TextAnalysis.dsirWeights: two Witten-Bell trigram models (target =
    * the DsirTargetLang subcorpus, source = all documents), per-doc mean
    * probabilities, weight ratio, and the md5-threshold resampling flag — every
    * constant interpolated from the Scala side. */
  val dsirWeights: String = {
    import graft.operators.TextAnalysis.{DsirSampleSalt, DsirTargetLang, LmProbScale}
    def model(pfx: String, where: String): String =
      s"""${pfx}tg AS (
         |  SELECT substr(text, t.i, 3) AS tri
         |  FROM documents, UNNEST(generate_series(1, len(text) - 2)) AS t(i)$where
         |),
         |${pfx}ct AS (SELECT tri, CAST(count(*) AS BIGINT) AS c_tri FROM ${pfx}tg GROUP BY tri),
         |${pfx}cb AS (
         |  SELECT substr(tri, 1, 2) AS bi, CAST(sum(c_tri) AS BIGINT) AS c_bi,
         |         CAST(count(*) AS BIGINT) AS t_bi
         |  FROM ${pfx}ct GROUP BY substr(tri, 1, 2)
         |),
         |${pfx}m AS (
         |  SELECT tri, (c_tri * $LmProbScale) // (c_bi + t_bi) AS p_e6
         |  FROM ${pfx}ct JOIN ${pfx}cb ON substr(${pfx}ct.tri, 1, 2) = ${pfx}cb.bi
         |)""".stripMargin
    val w = s"(t_score_e6 * $LmProbScale) // greatest(s_score_e6, 1)"
    val key = PortableHash.u32Sql(
      s"'$DsirSampleSalt:' || CAST(doc_id AS VARCHAR)") + s" % $LmProbScale"
    s"""WITH dtg AS (
       |  SELECT doc_id, lang, substr(text, t.i, 3) AS tri
       |  FROM documents, UNNEST(generate_series(1, len(text) - 2)) AS t(i)
       |),
       |${model("s", "")},
       |${model("t", s" WHERE lang = '$DsirTargetLang'")},
       |agg AS (
       |  SELECT dtg.doc_id, dtg.lang, CAST(count(*) AS BIGINT) AS n_tris,
       |         CAST(sum(coalesce(tm.p_e6, 0)) AS BIGINT) AS t_sum,
       |         CAST(sum(sm.p_e6) AS BIGINT) AS s_sum
       |  FROM dtg JOIN sm USING (tri) LEFT JOIN tm USING (tri)
       |  GROUP BY dtg.doc_id, dtg.lang
       |),
       |sc AS (
       |  SELECT doc_id, lang, n_tris,
       |         t_sum // n_tris AS t_score_e6, s_sum // n_tris AS s_score_e6
       |  FROM agg
       |)
       |SELECT doc_id, lang, n_tris, t_score_e6, s_score_e6,
       |       CAST($w AS BIGINT) AS weight_e6,
       |       CAST(CASE WHEN $key < least($w, $LmProbScale) THEN 1 ELSE 0 END AS INT) AS sampled
       |FROM sc ORDER BY doc_id""".stripMargin
  }

  /** Mirror of Retrieval.bm25TopK: the same ×2-cleared rational idf and
    * ×(10·L)-cleared tf normalization in `//` integer arithmetic, query VALUES
    * generated from the SAME [[graft.operators.Retrieval.Queries]] constant, N and L
    * as scalar subqueries so the SQL stays SF-independent. */
  val bm25TopK: String = {
    import graft.operators.Retrieval.{BmK, Queries}
    // terms are asserted [a-z]+ at Retrieval init; the quote-doubling here is the
    // defense-in-depth layer so a future relaxation of that pattern cannot
    // silently alter (or break) the generated oracle (ADVICE r4)
    val qvals = Queries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '${t.replace("'", "''")}')")
    }.mkString(", ")
    s"""WITH q(q_id, term) AS (VALUES $qvals),
       |dlx AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
       |        FROM documents),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(dl) AS BIGINT) AS l
       |       FROM dlx),
       |tk AS (SELECT doc_id, t.t AS term
       |       FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
       |       WHERE t.t IN (SELECT DISTINCT term FROM q)),
       |tf AS (SELECT tk.doc_id, dlx.dl, tk.term, CAST(count(*) AS BIGINT) AS tf
       |       FROM tk JOIN dlx USING (doc_id) GROUP BY tk.doc_id, dlx.dl, tk.term),
       |dfx AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |sc AS (
       |  SELECT q.q_id, tf.doc_id,
       |         ((2 * nn.n - 2 * dfx.df + 1) * 1000000) // (2 * dfx.df + 1) AS idf_e6,
       |         (22 * nn.l * tf.tf * 1000000)
       |           // (10 * nn.l * tf.tf + 3 * nn.l + 9 * tf.dl * nn.n) AS tfn_e6
       |  FROM tf JOIN dfx USING (term) JOIN q USING (term), nn
       |),
       |agg AS (
       |  SELECT q_id, doc_id,
       |         CAST(sum((idf_e6 * tfn_e6) // 1000000) AS BIGINT) AS score_e6
       |  FROM sc GROUP BY q_id, doc_id
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY score_e6 DESC, doc_id) AS rk
       |  FROM agg
       |)
       |SELECT CAST(q_id AS INT) AS q_id, CAST(rk AS BIGINT) AS rk, doc_id, score_e6
       |FROM ranked WHERE rk <= $BmK ORDER BY q_id, rk""".stripMargin
  }
}
