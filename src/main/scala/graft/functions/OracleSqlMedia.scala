package graft.functions

/**
 * DuckDB oracles for the multimodal media pipeline ([[graft.operators.MediaPipeline]]).
 *
 * The payload is a deterministic md5-block chain of the media_ref, so the oracle
 * reconstructs the exact payload HEX in SQL and recomputes every decode/feature value
 * from hex digits — the Spark side does the same work on real `binary` columns inside
 * its typed island; only integer-exact values are compared.
 */
object OracleSqlMedia {

  private def hv(expr: String): String =
    s"(instr('0123456789abcdef', $expr) - 1)"

  private def byteAt(ph: String, i: String): String =
    s"(${hv(s"substr($ph, 2 * ($i) + 1, 1)")} * 16 + ${hv(s"substr($ph, 2 * ($i) + 2, 1)")})"

  /** Media catalog + decode CTEs, appended to the extraction CTEs (reuses `mspans`).
    * A resolvable ref whose md5's THIRD hex digit is 'f' carries a CORRUPTED
    * container (flipped magic byte, [[graft.operators.MediaContainers.corruptRef]])
    * — the parse must fail into a row-level error, the "invalid image" archetype. */
  private val mediaCtes: String =
    s"""${OracleSql.extractionCtes},
       |refs AS (SELECT DISTINCT media_ref FROM mspans),
       |meta AS (
       |  SELECT media_ref, md5(media_ref) AS mh,
       |         CASE WHEN media_ref LIKE 'missing-%' THEN 0 ELSE 1 END AS okflag,
       |         CASE WHEN substr(md5(media_ref), 3, 1) = 'f' THEN 1 ELSE 0 END AS corrupt
       |  FROM refs
       |),
       |good AS (
       |  SELECT media_ref,
       |         2 + (${hv("substr(mh, 1, 1)")} % 4) AS nb,
       |         CASE (${hv("substr(mh, 2, 1)")} % 3)
       |           WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       |           ELSE 'video/mp4' END AS mime
       |  FROM meta WHERE okflag = 1 AND corrupt = 0
       |),
       |hexes AS (
       |  SELECT g2.media_ref, g2.mime, g2.nb,
       |         string_agg(md5(g2.media_ref || ':' || CAST(i.i AS VARCHAR)), ''
       |                    ORDER BY i.i) AS ph
       |  FROM good g2, UNNEST(generate_series(0, g2.nb - 1)) AS i(i)
       |  GROUP BY g2.media_ref, g2.mime, g2.nb
       |),
       |byted AS (
       |  SELECT media_ref, mime, nb, ph,
       |         ${byteAt("ph", "0")} AS b0, ${byteAt("ph", "1")} AS b1,
       |         ${byteAt("ph", "2")} AS b2, ${byteAt("ph", "3")} AS b3,
       |         ${byteAt("ph", "4")} AS b4
       |  FROM hexes
       |),
       |dec AS (
       |  SELECT media_ref, mime, 1 AS ok, CAST(NULL AS VARCHAR) AS error,
       |         nb * 16 AS n_bytes,
       |         CASE WHEN mime = 'audio/wav' THEN 0 ELSE 64 + b0 END AS w,
       |         CASE WHEN mime = 'audio/wav' THEN 0 ELSE 64 + b1 END AS h,
       |         CASE WHEN mime = 'image/png' THEN 0 ELSE b2 * 256 + b3 END AS duration_ms,
       |         CASE WHEN mime = 'image/png' THEN 1
       |              WHEN mime = 'audio/wav' THEN 0
       |              ELSE 1 + (b4 % 16) END AS n_frames,
       |         ph
       |  FROM byted
       |  UNION ALL
       |  SELECT media_ref, 'application/octet-stream', 0,
       |         'Unable to decode ' || media_ref, 0, 0, 0, 0, 0, ''
       |  FROM meta WHERE okflag = 0
       |  UNION ALL
       |  SELECT media_ref,
       |         CASE (${hv("substr(mh, 2, 1)")} % 3)
       |           WHEN 0 THEN 'image/png' WHEN 1 THEN 'audio/wav'
       |           ELSE 'video/mp4' END,
       |         0, 'bad container: ' || media_ref, 0, 0, 0, 0, 0, ''
       |  FROM meta WHERE okflag = 1 AND corrupt = 1
       |)""".stripMargin

  val mediaDecode: String =
    s"""$mediaCtes
       |SELECT media_ref, mime, CAST(ok AS INT) AS ok, error,
       |       CAST(n_bytes AS INT) AS n_bytes, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       |       CAST(duration_ms AS INT) AS duration_ms, CAST(n_frames AS INT) AS n_frames,
       |       md5(ph) AS payload_md5
       |FROM dec ORDER BY media_ref""".stripMargin

  val mediaFrames: String =
    s"""$mediaCtes
       |SELECT media_ref, CAST(i.i AS INT) AS frame_idx,
       |       CAST(floor((i.i * duration_ms) / n_frames) AS INT) AS t_ms,
       |       md5(media_ref || ':f:' || CAST(i.i AS VARCHAR)) AS frame_md5
       |FROM dec, UNNEST(generate_series(0, n_frames - 1)) AS i(i)
       |WHERE ok = 1 AND mime = 'video/mp4'
       |ORDER BY media_ref, frame_idx""".stripMargin

  val mediaResize: String =
    s"""$mediaCtes
       |SELECT media_ref, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
       |       CAST(greatest(1, floor(w / 2)) AS INT) AS out_w,
       |       CAST(greatest(1, floor(h / 2)) AS INT) AS out_h,
       |       md5(media_ref || ':resize:'
       |           || CAST(CAST(greatest(1, floor(w / 2)) AS INT) AS VARCHAR) || 'x'
       |           || CAST(CAST(greatest(1, floor(h / 2)) AS INT) AS VARCHAR)) AS resized_md5
       |FROM dec WHERE ok = 1 AND mime IN ('image/png', 'video/mp4')
       |ORDER BY media_ref""".stripMargin

  val mediaFeatures: String =
    s"""$mediaCtes,
       |bytes AS (
       |  SELECT media_ref, i.i AS i, ${byteAt("ph", "i.i")} AS b
       |  FROM dec, UNNEST(generate_series(0, n_bytes - 1)) AS i(i)
       |  WHERE ok = 1
       |)
       |SELECT media_ref,
       |       CAST(count(*) AS INT) AS n_bytes,
       |       CAST(sum(b) AS BIGINT) AS byte_sum,
       |       CAST(min(b) AS INT) AS byte_min,
       |       CAST(max(b) AS INT) AS byte_max,
       |       CAST(sum(CASE WHEN i % 8 = 0 THEN b ELSE 0 END) AS BIGINT) AS f0,
       |       CAST(sum(CASE WHEN i % 8 = 1 THEN b ELSE 0 END) AS BIGINT) AS f1,
       |       CAST(sum(CASE WHEN i % 8 = 2 THEN b ELSE 0 END) AS BIGINT) AS f2,
       |       CAST(sum(CASE WHEN i % 8 = 3 THEN b ELSE 0 END) AS BIGINT) AS f3,
       |       CAST(sum(CASE WHEN i % 8 = 4 THEN b ELSE 0 END) AS BIGINT) AS f4,
       |       CAST(sum(CASE WHEN i % 8 = 5 THEN b ELSE 0 END) AS BIGINT) AS f5,
       |       CAST(sum(CASE WHEN i % 8 = 6 THEN b ELSE 0 END) AS BIGINT) AS f6,
       |       CAST(sum(CASE WHEN i % 8 = 7 THEN b ELSE 0 END) AS BIGINT) AS f7
       |FROM bytes GROUP BY media_ref ORDER BY media_ref""".stripMargin
}
