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
    val noise = graft.operators.TextAnalysis.UnicodeNoise
    val norm =
      """lower(trim(regexp_replace(nfc_normalize(text), '[\t\n\x0B\f\r \p{Zs}\x{200B}]+', ' ', 'g')))"""
    s"""WITH ncorpus AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 500000 AS doc_id, text || '$noise' AS text
       |  FROM documents WHERE doc_id % 7 = 0
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
    """WITH tk AS (
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
      |FROM ranked WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin
}
