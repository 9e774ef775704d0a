package graft.functions

/** DuckDB oracles for the training-data hygiene family ([[graft.operators.Hygiene]]). */
object OracleSqlHygiene {

  private def shingles(n: Int): String =
    s"""list_transform(
       |  generate_series(0, greatest(0, len(string_split(text, ' ')) - $n)),
       |  i -> array_to_string(list_slice(string_split(text, ' '), i + 1, i + $n), ' '))""".stripMargin

  val repetition: String =
    s"""WITH sh AS (SELECT doc_id, ${shingles(3)} AS s FROM documents)
       |SELECT doc_id,
       |       CAST(len(s) AS BIGINT) AS n_shingles,
       |       CAST(len(list_distinct(s)) AS BIGINT) AS n_distinct,
       |       CAST(floor((1000000.0 * (len(s) - len(list_distinct(s)))) / len(s)) AS BIGINT) AS dup_ratio_e6
       |FROM sh ORDER BY doc_id""".stripMargin

  val decontaminate: String =
    s"""WITH sh AS (
       |  SELECT doc_id, t.t AS s
       |  FROM (SELECT doc_id, list_distinct(${shingles(8)}) AS ss FROM documents),
       |       UNNEST(ss) AS t(t)
       |),
       |evs AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
       |hits AS (
       |  SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_hits
       |  FROM sh JOIN evs ON sh.s = evs.s
       |  WHERE sh.doc_id % 50 <> 0
       |  GROUP BY sh.doc_id
       |)
       |SELECT d.doc_id, coalesce(h.n_hits, 0) AS n_hits,
       |       CASE WHEN coalesce(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
       |FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
       |WHERE d.doc_id % 50 <> 0
       |ORDER BY d.doc_id""".stripMargin

  val piiRedact: String =
    """WITH p AS (
      |  SELECT doc_id,
      |         CASE WHEN doc_id % 7 = 0
      |              THEN text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com ref 99123456789'
      |              ELSE text END AS text
      |  FROM documents
      |),
      |r AS (
      |  SELECT doc_id, text,
      |         regexp_replace(regexp_replace(text, '[a-z0-9]+@[a-z]+[.][a-z]+', '<EMAIL>', 'g'),
      |                        '[0-9]{6,}', '<NUM>', 'g') AS red
      |  FROM p
      |)
      |SELECT doc_id,
      |       CAST(len(regexp_extract_all(text, '[a-z0-9]+@[a-z]+[.][a-z]+')) AS BIGINT) AS n_emails,
      |       CAST(len(regexp_extract_all(text, '[0-9]{6,}')) AS BIGINT) AS n_nums,
      |       CAST(length(text) AS BIGINT) AS len_before,
      |       CAST(length(red) AS BIGINT) AS len_after,
      |       md5(red) AS redacted_md5
      |FROM r ORDER BY doc_id""".stripMargin
}
