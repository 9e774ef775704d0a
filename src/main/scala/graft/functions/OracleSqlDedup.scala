package graft.functions

/**
 * DuckDB oracle mirrors for the dedup / text-analysis operator family
 * ([[graft.operators.Dedup]], [[graft.operators.TextAnalysis]],
 * [[graft.functions.SimHash64]]). Same parity rules as [[OracleSql]].
 */
object OracleSqlDedup {

  /** documents + exact copies of every 13th doc — mirror of Dedup.withExactCopies. */
  private val exactCorpusCte =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
      |)""".stripMargin

  /** documents + 'mutant '-prefixed copies of every 10th doc — mirror of
    * Dedup.withMutants. */
  private val mutantCorpusCte =
    """mcorpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, 'mutant ' || text AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |)""".stripMargin

  val dedupExact: String =
    s"""$exactCorpusCte
       |SELECT doc_id, md5(text) AS content_hash,
       |       CAST(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS BIGINT) AS dup_rank,
       |       CASE WHEN row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) > 1 THEN 1 ELSE 0 END AS is_dup
       |FROM corpus ORDER BY doc_id""".stripMargin

  val textQuality: String = {
    val sw = graft.operators.TextAnalysis.Stopwords.map(w => s"'$w'").mkString(",")
    s"""WITH tk AS (
      |  SELECT doc_id, length(text) AS lc, string_split(text, ' ') AS t FROM documents
      |)
      |SELECT doc_id,
      |       CAST(lc AS BIGINT) AS n_chars_m,
      |       CAST(len(t) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
      |       CAST(floor(1000000.0 * len(list_distinct(t)) / len(t)) AS BIGINT) AS richness_e6,
      |       CAST(floor(1000000.0 * len(list_filter(t, x -> x IN ($sw))) / len(t)) AS BIGINT) AS stop_ratio_e6,
      |       CAST(floor(1000000.0 * CAST(list_aggregate(list_transform(t, x -> CAST(length(x) AS BIGINT)), 'sum') AS BIGINT) / len(t)) AS BIGINT) AS avg_tok_len_e6
      |FROM tk ORDER BY doc_id""".stripMargin
  }

  val langId: String = {
    // marker lists interpolated from TextAnalysis.LangMarkers — one source of truth
    val mk = graft.operators.TextAnalysis.LangMarkers.toMap
      .map { case (l, ws) => l -> ws.map(w => s"'$w'").mkString(",") }
    s"""WITH tk AS (
      |  SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      |),
      |sc AS (
      |  SELECT doc_id, lang,
      |         CAST(len(list_filter(t, x -> x IN (${mk("en")}))) AS BIGINT) AS s_en,
      |         CAST(len(list_filter(t, x -> x IN (${mk("de")}))) AS BIGINT) AS s_de,
      |         CAST(len(list_filter(t, x -> x IN (${mk("es")}))) AS BIGINT) AS s_es,
      |         CAST(len(list_filter(t, x -> x IN (${mk("fr")}))) AS BIGINT) AS s_fr
      |  FROM tk
      |)
      |SELECT doc_id, lang, s_en, s_de, s_es, s_fr,
      |       CASE WHEN s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
      |            WHEN s_es > s_en AND s_es >= s_fr THEN 'es'
      |            WHEN s_fr > s_en THEN 'fr'
      |            ELSE 'en' END AS pred_lang,
      |       CASE WHEN (CASE WHEN s_de > s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
      |                       WHEN s_es > s_en AND s_es >= s_fr THEN 'es'
      |                       WHEN s_fr > s_en THEN 'fr'
      |                       ELSE 'en' END) = lang THEN 1 ELSE 0 END AS correct
      |FROM sc ORDER BY doc_id""".stripMargin
  }

  val tokenStats: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |)
      |SELECT doc_id,
      |       CAST(len(t) AS BIGINT) AS n_tokens,
      |       CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
      |       CAST(list_aggregate(list_transform(t, x -> CAST(length(x) AS BIGINT)), 'max') AS BIGINT) AS max_tok_len,
      |       CAST(list_aggregate(list_transform(t, x -> CAST(floor((length(x) + 3) / 4.0) AS BIGINT)), 'sum') AS BIGINT) AS n_subwords
      |FROM tk ORDER BY doc_id""".stripMargin

  /** Mirror of [[graft.operators.TextAnalysis.tokenQuantiles]] — the same
    * histogram + cumulative-window + ceil-threshold formulation, quantile points
    * interpolated from the Scala constant, all-integer arithmetic (`//`). */
  val tokenQuantiles: String = {
    val points = graft.operators.TextAnalysis.QuantilePoints.mkString(", ")
    s"""WITH hist AS (
       |  SELECT lang, len(string_split(text, ' ')) AS v, count(*) AS cnt
       |  FROM documents GROUP BY lang, v
       |),
       |cum AS (
       |  SELECT lang, v, sum(cnt) OVER (PARTITION BY lang ORDER BY v
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM hist
       |),
       |qs AS (
       |  SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_docs, CAST(t.q AS BIGINT) AS q
       |  FROM hist, UNNEST([$points]) AS t(q) GROUP BY lang, t.q
       |)
       |SELECT qs.lang, qs.q, qs.n_docs, CAST(min(c.v) AS BIGINT) AS value
       |FROM qs JOIN cum c ON c.lang = qs.lang
       |  AND c.cum >= (qs.q * qs.n_docs + 99) // 100
       |GROUP BY qs.lang, qs.q, qs.n_docs
       |ORDER BY qs.lang, qs.q""".stripMargin
  }

  val fingerprint: String =
    """WITH tk AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |),
      |shq AS (
      |  SELECT doc_id,
      |         list_transform(generate_series(0, greatest(0, len(t) - 5)), i -> md5(array_to_string(t[i+1:i+5], ' '))) AS sh
      |  FROM tk
      |)
      |SELECT doc_id, list_aggregate(sh, 'min') AS fp, CAST(len(sh) AS BIGINT) AS n_shingles
      |FROM shq ORDER BY doc_id""".stripMargin

  /** documents + exact copies + mutants of BOTH (every 10th id in the widened set) —
    * mirror of Dedup.withGroupCorpus = withMutants(withExactCopies(documents)).
    * A copy id d+200000 is divisible by 10 iff d is, so its mutant lands at
    * d+300000 exactly when d % 130 == 0. */
  private val groupCorpusCte =
    """gcorpus AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 200000 AS doc_id, text FROM documents WHERE doc_id % 13 = 0
      |  UNION ALL
      |  SELECT doc_id + 100000 AS doc_id, 'mutant ' || text AS text
      |  FROM documents WHERE doc_id % 10 = 0
      |  UNION ALL
      |  SELECT doc_id + 300000 AS doc_id, 'mutant ' || text AS text
      |  FROM documents WHERE doc_id % 13 = 0 AND doc_id % 10 = 0
      |)""".stripMargin

  /** Minhash CTE chain (3-gram shingles, 8 perms, 4 bands) over the named corpus
    * CTE. The chain ends at `bandsc` — the OCCUPANCY-CAPPED bands (mirror of
    * Dedup.dropOversized); candidate joins must read `bandsc`, never raw `bands`,
    * or they bypass the cap. `shq` stays visible for the verify stage;
    * minhash_bands reads raw `bands` deliberately (signatures are uncapped). */
  private def minhashChainOver(corpus: String): String = {
    val sigs = (0 until 8).map(p =>
      s"list_aggregate(list_transform(sh, s -> md5('$p|' || s)), 'min') AS mh$p").mkString(",\n         ")
    s"""tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM $corpus),
       |shq AS (
       |  SELECT doc_id,
       |         list_transform(generate_series(0, greatest(0, len(t) - 3)), i -> array_to_string(t[i+1:i+3], ' ')) AS sh
       |  FROM tk
       |),
       |sig AS (
       |  SELECT doc_id,
       |         $sigs
       |  FROM shq
       |),
       |bands AS (
       |  SELECT doc_id, b.band,
       |         CASE b.band WHEN 0 THEN md5(mh0 || mh1) WHEN 1 THEN md5(mh2 || mh3)
       |                     WHEN 2 THEN md5(mh4 || mh5) ELSE md5(mh6 || mh7) END AS band_hash
       |  FROM sig, UNNEST([0, 1, 2, 3]) AS b(band)
       |),
       |bandsc AS (
       |  SELECT doc_id, band, band_hash FROM bands
       |  QUALIFY count(*) OVER (PARTITION BY band, band_hash) <= ${graft.operators.Dedup.MaxBucketOccupancy}
       |)""".stripMargin
  }

  /** The standing mutant-corpus instance of the minhash chain. */
  private val minhashCtes: String =
    s"""WITH $mutantCorpusCte,
       |${minhashChainOver("mcorpus")}""".stripMargin

  /** LSH candidate + exact-Jaccard verify chain over whatever corpus `bands`/`shq`
    * were built on; ends at `near_pairs` (doc_a, doc_b with jaccard >= 0.5). */
  private val nearPairsChain: String =
    """cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM bandsc a JOIN bandsc b
      |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
      |),
      |shd AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shq),
      |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
      |inter AS (
      |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS ni
      |  FROM cand c
      |  JOIN shd sa ON sa.doc_id = c.doc_a
      |  JOIN shd sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
      |  GROUP BY c.doc_a, c.doc_b
      |),
      |near_pairs AS (
      |  SELECT i.doc_a, i.doc_b
      |  FROM inter i
      |  JOIN sizes na ON na.doc_id = i.doc_a
      |  JOIN sizes nb ON nb.doc_id = i.doc_b
      |  WHERE CAST(floor(1000000.0 * i.ni / (na.n + nb.n - i.ni)) AS BIGINT) >= 500000
      |)""".stripMargin

  /** Shared closure chain for [[dedupGroups]] / [[dedupApply]]: exact star edges
    * UNION verified near-dup pairs over the group corpus, then component reps via
    * a recursive reachability closure (edges are symmetric, so
    * min-reachable-vertex = component min — the same rep
    * Dedup.connectedComponents converges to). Ends at `comp` (doc_id -> rep_id)
    * and `gs` (rep_id -> group_size). */
  private val groupsCtes: String =
    s"""WITH RECURSIVE $groupCorpusCte,
       |${minhashChainOver("gcorpus")},
       |$nearPairsChain,
       |eh AS (SELECT doc_id, md5(text) AS h FROM gcorpus),
       |exact_e AS (
       |  SELECT m.h_min AS doc_a, e.doc_id AS doc_b
       |  FROM eh e JOIN (SELECT h, min(doc_id) AS h_min FROM eh GROUP BY h) m ON m.h = e.h
       |  WHERE e.doc_id <> m.h_min
       |),
       |alle AS (
       |  SELECT doc_a, doc_b FROM exact_e UNION SELECT doc_a, doc_b FROM near_pairs
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM alle
       |  UNION SELECT doc_b AS src, doc_a AS dst FROM alle
       |),
       |reach AS (
       |  SELECT doc_id AS v, doc_id AS r FROM gcorpus
       |  UNION
       |  SELECT e.dst AS v, reach.r FROM reach JOIN edges e ON e.src = reach.v
       |),
       |comp AS (SELECT v AS doc_id, min(r) AS rep_id FROM reach GROUP BY v),
       |gs AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS group_size FROM comp GROUP BY rep_id)""".stripMargin

  val dedupGroups: String =
    s"""$groupsCtes
       |SELECT c.doc_id, c.rep_id, g.group_size,
       |       CAST(CASE WHEN c.doc_id = c.rep_id THEN 1 ELSE 0 END AS INT) AS is_canonical
       |FROM comp c JOIN gs g ON g.rep_id = c.rep_id
       |WHERE g.group_size >= 2
       |ORDER BY doc_id""".stripMargin

  /** Mirror of Dedup.dedupApply: the group corpus minus every non-canonical group
    * member — membership AND content identity (md5) under one hash. */
  val dedupApply: String =
    s"""$groupsCtes,
       |losers AS (
       |  SELECT c.doc_id FROM comp c JOIN gs g ON g.rep_id = c.rep_id
       |  WHERE g.group_size >= 2 AND c.doc_id <> c.rep_id
       |)
       |SELECT g.doc_id, md5(g.text) AS content_hash
       |FROM gcorpus g
       |WHERE g.doc_id NOT IN (SELECT doc_id FROM losers)
       |ORDER BY doc_id""".stripMargin

  val minhashBands: String =
    s"""$minhashCtes
       |SELECT doc_id, band, band_hash FROM bands ORDER BY doc_id, band""".stripMargin

  /** Mirror of Dedup.windowDup: distinct 5-token window md5s, occupancy-capped
    * self-join, containment vs the UNCAPPED distinct-window count of the smaller
    * doc, threshold 0.5. Window formula matches the fingerprint oracle's shingles
    * (t[i+1:i+5], end-clamped like Spark's slice). */
  val windowDup: String =
    s"""WITH $mutantCorpusCte,
       |tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM mcorpus),
       |whq AS (
       |  SELECT doc_id,
       |         list_transform(generate_series(0, greatest(0, len(t) - 5)), i -> md5(array_to_string(t[i+1:i+5], ' '))) AS ws
       |  FROM tk
       |),
       |whx AS (SELECT doc_id, unnest(ws) AS whash FROM whq),
       |wh AS (SELECT DISTINCT doc_id, whash FROM whx),
       |nw AS (SELECT doc_id, count(*) AS n FROM wh GROUP BY doc_id),
       |whc AS (
       |  SELECT doc_id, whash FROM wh
       |  QUALIFY count(*) OVER (PARTITION BY whash) <= ${graft.operators.Dedup.MaxBucketOccupancy}
       |),
       |p AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
       |  FROM whc a JOIN whc b ON a.whash = b.whash AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id
       |)
       |SELECT p.doc_a, p.doc_b, CAST(p.n_shared AS BIGINT) AS n_shared,
       |       CAST(floor(1000000.0 * p.n_shared / least(na.n, nb.n)) AS BIGINT) AS containment_e6
       |FROM p JOIN nw na ON p.doc_a = na.doc_id JOIN nw nb ON p.doc_b = nb.doc_id
       |WHERE floor(1000000.0 * p.n_shared / least(na.n, nb.n)) >= 500000
       |ORDER BY p.doc_a, p.doc_b""".stripMargin

  val neardupPairs: String =
    s"""$minhashCtes,
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bandsc a JOIN bandsc b
       |    ON a.band = b.band AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
       |),
       |shd AS (SELECT doc_id, unnest(list_distinct(sh)) AS s FROM shq),
       |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shd GROUP BY doc_id),
       |inter AS (
       |  SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS ni
       |  FROM cand c
       |  JOIN shd sa ON sa.doc_id = c.doc_a
       |  JOIN shd sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
       |  GROUP BY c.doc_a, c.doc_b
       |)
       |SELECT i.doc_a, i.doc_b,
       |       CAST(floor(1000000.0 * i.ni / (na.n + nb.n - i.ni)) AS BIGINT) AS jaccard_e6
       |FROM inter i
       |JOIN sizes na ON na.doc_id = i.doc_a
       |JOIN sizes nb ON nb.doc_id = i.doc_b
       |WHERE CAST(floor(1000000.0 * i.ni / (na.n + nb.n - i.ni)) AS BIGINT) >= 500000
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Mirror of Dedup.neardupIncremental over (documents, mutants delta): the
    * incremental contract is "exactly the full-corpus pair set restricted to pairs
    * touching a new document", and since every delta id is >= 100000 while corpus
    * ids are below it, the restriction is doc_b >= 100000 (doc_a < doc_b). The
    * Spark side takes a completely different route (committed signature read + delta
    * bands + new-side semi-join); agreeing with THIS query is what proves the
    * incremental path loses/invents nothing. */
  lazy val neardupIncremental: String =
    s"""SELECT doc_a, doc_b, jaccard_e6 FROM (
       |$neardupPairs
       |) WHERE doc_b >= 100000 ORDER BY doc_a, doc_b""".stripMargin

  /** 64 per-bit weight sums + recombination — mirror of SimHashImpl.simhash64.
    * Bit k = bit (3 - k%4) of hex digit k/4 of md5(token); recombination goes through
    * HUGEINT (`utotal`, the unsigned value) because bit 63 overflows a signed BIGINT
    * sum — the signed `simhash` is utotal wrapped to two's complement, matching the
    * JVM's `1L << 63`. `utotal` is also what block bucketing divides, so no signed
    * shift arithmetic is ever mirrored. */
  private val simhashCtes: String = {
    val digits = (0 until 16).map(j =>
      s"instr('0123456789abcdef', substr(h, ${j + 1}, 1)) - 1 AS d$j").mkString(",\n         ")
    val sums = (0 until 64).map { k =>
      val j = k / 4
      val e = 3 - k % 4
      s"SUM(CAST(floor(d$j / power(2, $e)) AS BIGINT) % 2 * 2 - 1) AS s$k"
    }.mkString(",\n         ")
    val recomb = (0 until 64)
      .map(k => s"CASE WHEN s$k >= 0 THEN CAST('${BigInt(1) << k}' AS HUGEINT) ELSE CAST('0' AS HUGEINT) END")
      .mkString(" + ")
    s"""WITH $mutantCorpusCte,
       |tokh AS (
       |  SELECT doc_id, md5(t.t) AS h FROM mcorpus, UNNEST(string_split(text, ' ')) AS t(t)
       |),
       |dig AS (
       |  SELECT doc_id,
       |         $digits
       |  FROM tokh
       |),
       |bitsums AS (
       |  SELECT doc_id,
       |         $sums
       |  FROM dig GROUP BY doc_id
       |),
       |sp AS (
       |  SELECT doc_id, ($recomb) AS utotal FROM bitsums
       |),
       |sps AS (
       |  SELECT doc_id, utotal,
       |         CAST(utotal - CASE WHEN utotal >= CAST('9223372036854775808' AS HUGEINT)
       |                            THEN CAST('18446744073709551616' AS HUGEINT)
       |                            ELSE CAST('0' AS HUGEINT) END AS BIGINT) AS simhash
       |  FROM sp
       |)""".stripMargin
  }

  val simhash: String =
    s"""$simhashCtes
       |SELECT doc_id, simhash FROM sps ORDER BY doc_id""".stripMargin

  val simhashPairs: String =
    s"""$simhashCtes,
       |bk AS (
       |  SELECT doc_id, simhash, b.b AS block_idx,
       |         CAST((utotal // CASE b.b
       |                 WHEN 0 THEN CAST('1' AS HUGEINT)
       |                 WHEN 1 THEN CAST('${BigInt(65536)}' AS HUGEINT)
       |                 WHEN 2 THEN CAST('${BigInt(65536).pow(2)}' AS HUGEINT)
       |                 ELSE CAST('${BigInt(65536).pow(3)}' AS HUGEINT) END) % 65536
       |              AS BIGINT) AS block_val
       |  FROM sps, UNNEST([0, 1, 2, 3]) AS b(b)
       |),
       |bkc AS (
       |  SELECT doc_id, simhash, block_idx, block_val FROM bk
       |  QUALIFY count(*) OVER (PARTITION BY block_idx, block_val) <= ${graft.operators.Dedup.MaxBucketOccupancy}
       |),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa, b.doc_id AS doc_b, b.simhash AS sb
       |  FROM bkc a JOIN bkc b
       |    ON a.block_idx = b.block_idx AND a.block_val = b.block_val AND a.doc_id < b.doc_id
       |)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
       |FROM pairs
       |WHERE CAST(bit_count(xor(sa, sb)) AS BIGINT) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
}
