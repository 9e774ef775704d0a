package graft.functions

import graft.operators.Capabilities
import graft.sources.Languages

/**
 * DuckDB oracles for the reference-API surface operators: the LANGUAGE_CODES dimension,
 * the capability-string parse, and the broadcast language-dimension join. The dimension
 * VALUES clauses are GENERATED from the same Scala constants the Spark side uses, so the
 * two can never drift.
 */
object OracleSqlRef {

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  private val langValues: String =
    Languages.LanguageCodes
      .map { case (c, n) => s"(${q(c)}, ${q(n)})" }
      .mkString(", ")

  val langCodes: String =
    s"""SELECT lang_code, lang_name, lang_code || '.traineddata' AS traineddata
       |FROM (VALUES $langValues) AS t(lang_code, lang_name)
       |ORDER BY lang_code""".stripMargin

  val capabilities: String =
    s"""WITH segs AS (
       |  SELECT trim(s.s) AS seg
       |  FROM UNNEST(string_split(${q(Capabilities.ImageLibVersions)}, ':')) AS s(s)
       |),
       |parsed AS (
       |  SELECT split_part(seg, ' ', 1) AS lib, split_part(seg, ' ', 2) AS version
       |  FROM segs
       |  UNION ALL
       |  SELECT 'tesseract-contract', ${q(Capabilities.EngineVersion)}
       |)
       |SELECT lib, version,
       |       CASE WHEN regexp_matches(version, ${q(Capabilities.VersionRegex)})
       |            THEN 1 ELSE 0 END AS version_ok
       |FROM parsed ORDER BY lib""".stripMargin

  /** Corpus lang -> tessdata code mapping used by [[graft.SparkEntry]] `lang_join`. */
  val corpusToTess: Seq[(String, String)] = Seq(
    "en" -> "eng", "fr" -> "fra", "de" -> "deu", "es" -> "spa", "zh" -> "chi_sim")

  /** Mirror of [[graft.operators.Sessions.sessionize]] (30-minute gap). */
  val sessionize: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
      |              THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |),
      |a AS (
      |  SELECT user_id, event_type, ts_us,
      |         CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS session_idx
      |  FROM e
      |)
      |SELECT user_id, session_idx,
      |       CAST(count(*) AS BIGINT) AS n_events,
      |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
      |       CAST(min(ts_us) AS BIGINT) AS start_us,
      |       CAST(max(ts_us) AS BIGINT) AS end_us,
      |       CAST(max(ts_us) - min(ts_us) AS BIGINT) AS dur_us
      |FROM a GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  /** Mirror of [[graft.operators.AsOf.asofJoin]]: the identical union + running
    * last-ignore-nulls window (the chunked heavy-user route is output-invisible by
    * construction and proof — AsOfSpec — so ONE oracle covers both routes). Side
    * types interpolate from the Scala constants; the two engines share the total
    * order (ts_us, is_left, event_id). */
  val asofJoin: String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
       |),
       |u AS (
       |  SELECT event_id, user_id, ts_us, 1 AS is_left,
       |         CAST(NULL AS BIGINT) AS r_id, CAST(NULL AS BIGINT) AS r_ts
       |  FROM ev WHERE event_type = ${q(graft.operators.AsOf.LeftType)}
       |  UNION ALL
       |  SELECT event_id, user_id, ts_us, 0, event_id, ts_us
       |  FROM ev WHERE event_type = ${q(graft.operators.AsOf.RightType)}
       |),
       |m AS (
       |  SELECT event_id, user_id, ts_us, is_left,
       |         last_value(r_id IGNORE NULLS) OVER w AS matched_event_id,
       |         last_value(r_ts IGNORE NULLS) OVER w AS m_ts
       |  FROM u
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, is_left, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       |)
       |SELECT event_id, user_id, CAST(ts_us AS BIGINT) AS ts_us,
       |       CAST(matched_event_id AS BIGINT) AS matched_event_id,
       |       CAST(ts_us - m_ts AS BIGINT) AS gap_us
       |FROM m WHERE is_left = 1 ORDER BY event_id""".stripMargin

  /** Mirror of [[graft.operators.Sessions.eventRates]]: epoch-aligned 1-hour
    * buckets (`time_bucket` == Spark's epoch-origin tumbling `window()`). */
  val eventRates: String =
    """SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS win_start_us,
      |       event_type, CAST(count(*) AS BIGINT) AS n_events
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Mirror of [[graft.operators.RangeJoin.rangeJoin]] — deliberately the
    * UNDECOMPOSED theta join (no time chunks), so the Spark side's chunked
    * equi-join decomposition is verified against an independent formulation. */
  val rangeJoin: String =
    s"""WITH ev AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type FROM events
       |),
       |inc AS (
       |  SELECT event_id AS incident_id, ts_us AS lo_us,
       |         ts_us + ${graft.operators.RangeJoin.WindowUs} AS hi_us
       |  FROM ev WHERE event_type = ${q(graft.operators.RangeJoin.IncidentType)}
       |)
       |SELECT i.incident_id, CAST(i.lo_us AS BIGINT) AS lo_us,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
       |       CAST(count(DISTINCT e.event_type) AS BIGINT) AS n_types,
       |       CAST(max(e.ts_us) - i.lo_us AS BIGINT) AS span_us
       |FROM inc i JOIN ev e ON e.ts_us >= i.lo_us AND e.ts_us < i.hi_us
       |GROUP BY i.incident_id, i.lo_us
       |ORDER BY i.incident_id""".stripMargin

  /** Mirror of [[graft.operators.Layout.zorderKey]]: the same bit interleave, lang
    * CASE dimension generated from the Scala constant. */
  val zorderKey: String = {
    import graft.operators.Layout.{LangIndex, ZBits}
    val cases = LangIndex.map { case (l, i) => s"WHEN ${q(l)} THEN $i" }.mkString(" ")
    s"""WITH d AS (
       |  SELECT doc_id,
       |         CAST(CASE lang $cases ELSE ${LangIndex.size} END AS BIGINT) AS lang_idx,
       |         CAST(least(n_chars, 65535) AS BIGINT) AS n_c
       |  FROM documents
       |)
       |SELECT doc_id, lang_idx, n_c,
       |       CAST(list_sum(list_transform(generate_series(0, ${ZBits - 1}), i ->
       |         (((lang_idx >> i) & 1) << (2*i+1)) + (((n_c >> i) & 1) << (2*i))))
       |         AS BIGINT) AS zval
       |FROM d ORDER BY doc_id""".stripMargin
  }

  val langJoin: String = {
    val mapValues = corpusToTess.map { case (a, b) => s"(${q(a)}, ${q(b)})" }
      .mkString(", ")
    s"""WITH dim AS (SELECT * FROM (VALUES $langValues) AS t(lang_code, lang_name)),
       |m AS (SELECT * FROM (VALUES $mapValues) AS t(lang, lang_code)),
       |counts AS (
       |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS n_chars
       |  FROM documents GROUP BY lang
       |)
       |SELECT c.lang, m.lang_code, d.lang_name, c.n_docs, c.n_chars
       |FROM counts c
       |LEFT JOIN m ON c.lang = m.lang
       |LEFT JOIN dim d ON m.lang_code = d.lang_code
       |ORDER BY c.lang""".stripMargin
  }
}
