package graft.functions

/**
 * DuckDB oracles for the similarity-search family ([[graft.operators.Similarity]]).
 *
 * Exactness contract (see Similarity's scaladoc): vectors are integer-quantized
 * (floor(x·1000) per element) so dots and squared norms are exact integers; the single
 * sqrt/multiply/divide chain is associated IDENTICALLY to the Spark expressions, so the
 * final floor(1e6·cos) is bit-identical and hash-comparable. `list_zip` + positional
 * struct indexing gives DuckDB the exact integer dot product (HUGEINT, cast down).
 */
object OracleSqlSim {

  /** Quantized-vector CTEs over raw float embeddings. */
  private val rawCtes: String =
    """WITH v AS (
      |  SELECT vec_id,
      |         list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
      |  FROM embeddings
      |),
      |vn AS (
      |  SELECT vec_id, q,
      |         CAST(list_sum(list_transform(list_zip(q, q), z -> z[1] * z[2])) AS BIGINT) AS n2
      |  FROM v
      |)""".stripMargin

  /** Quantized-vector CTEs over the mutant-widened set (Similarity.withEmbMutants). */
  private val mutantCtes: String =
    """WITH ve AS (
      |  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
      |  FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 100000,
      |         list_transform(embedding, x -> CAST(x AS DOUBLE) * 1.01 + 0.001)
      |  FROM embeddings WHERE vec_id % 10 = 0
      |),
      |v AS (
      |  SELECT vec_id, list_transform(emb, x -> CAST(floor(x * 1000) AS BIGINT)) AS q
      |  FROM ve
      |),
      |vn AS (
      |  SELECT vec_id, q,
      |         CAST(list_sum(list_transform(list_zip(q, q), z -> z[1] * z[2])) AS BIGINT) AS n2
      |  FROM v
      |)""".stripMargin

  private def dot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(list_zip($a, $b), z -> z[1] * z[2])) AS BIGINT)"

  private def cosE6(dot: String, n2a: String, n2b: String): String =
    s"CAST(floor((1000000.0 * $dot) / (sqrt(CAST($n2a AS DOUBLE)) * sqrt(CAST($n2b AS DOUBLE)))) AS BIGINT)"

  val annTopK: String =
    s"""$rawCtes,
       |qs AS (SELECT vec_id AS query_id, q AS qq, n2 AS qn2 FROM vn WHERE vec_id % ${graft.operators.Similarity.QueryMod} = 0),
       |scored AS (
       |  SELECT qs.query_id, vn.vec_id AS neighbor_id,
       |         ${cosE6(dot("qs.qq", "vn.q"), "qs.qn2", "vn.n2")} AS cos_e6
       |  FROM qs, vn WHERE vn.vec_id <> qs.query_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_e6,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, neighbor_id) AS rn
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS "rank", cos_e6
       |FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** Per-band bucket keys from the SAME seeded hyperplane matrix the Spark operator
    * uses ([[LshPlanes]] embeds it here as ±1 literal lists): one UNION ALL branch per
    * band, each key an exact integer sign-bit sum. */
  private val lshBandsSql: String =
    (0 until LshPlanes.Bands).map { b =>
      s"""  SELECT vec_id, q, n2, $b AS band,
         |         ${LshPlanes.keySql(b, "q")} AS key
         |  FROM vn""".stripMargin
    }.mkString("\n  UNION ALL\n")

  val annLshPairs: String =
    s"""$mutantCtes,
       |bands AS (
       |$lshBandsSql
       |),
       |bandsc AS (
       |  SELECT * FROM bands
       |  QUALIFY count(*) OVER (PARTITION BY band, key) <= ${graft.operators.Dedup.MaxBucketOccupancy}
       |),
       |pairs AS (
       |  SELECT DISTINCT a.vec_id AS vec_a, b2.vec_id AS vec_b,
       |         ${cosE6(dot("a.q", "b2.q"), "a.n2", "b2.n2")} AS cos_e6
       |  FROM bandsc a JOIN bandsc b2
       |    ON a.band = b2.band AND a.key = b2.key AND a.vec_id < b2.vec_id
       |)
       |SELECT vec_a, vec_b, cos_e6 FROM pairs
       |WHERE cos_e6 >= 900000 ORDER BY vec_a, vec_b""".stripMargin

  /** Mirror of [[graft.operators.Similarity.knnGraph]]: both-direction co-bucket
    * candidates (deduped across bands, occupancy-capped) ranked per vertex by
    * (cos desc, neighbor_id) — the same tie-break [[annTopK]] pins for TopKAgg. */
  val knnGraph: String =
    s"""$mutantCtes,
       |bands AS (
       |$lshBandsSql
       |),
       |bandsc AS (
       |  SELECT * FROM bands
       |  QUALIFY count(*) OVER (PARTITION BY band, key) <= ${graft.operators.Dedup.MaxBucketOccupancy}
       |),
       |cand AS (
       |  SELECT DISTINCT a.vec_id, b2.vec_id AS neighbor_id,
       |         ${cosE6(dot("a.q", "b2.q"), "a.n2", "b2.n2")} AS cos_e6
       |  FROM bandsc a JOIN bandsc b2
       |    ON a.band = b2.band AND a.key = b2.key AND a.vec_id <> b2.vec_id
       |),
       |ranked AS (
       |  SELECT vec_id, neighbor_id, cos_e6,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY cos_e6 DESC, neighbor_id) AS rn
       |  FROM cand
       |)
       |SELECT vec_id, CAST(rn AS BIGINT) AS "rank", neighbor_id, cos_e6
       |FROM ranked WHERE rn <= ${graft.operators.Similarity.DefaultK}
       |ORDER BY vec_id, rn""".stripMargin

  /** Mirrors [[graft.operators.Similarity.embedNeardupAudit]]: the registered exact
    * all-pairs query runs on the deterministic vec_id % AuditMod == 0 audit subset
    * (AuditMod = 4 divides the mutant stride 100000, so sampled vectors keep their
    * mutant twins). */
  val embedNeardup: String =
    s"""$mutantCtes,
       |vs AS (SELECT * FROM vn WHERE vec_id % ${graft.operators.Similarity.AuditMod} = 0)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |       ${cosE6(dot("a.q", "b.q"), "a.n2", "b.n2")} AS cos_e6
       |FROM vs a JOIN vs b ON a.vec_id < b.vec_id
       |WHERE ${cosE6(dot("a.q", "b.q"), "a.n2", "b.n2")} >= 900000
       |ORDER BY vec_a, vec_b""".stripMargin

  val ivfTopK: String =
    s"""$rawCtes,
       |cents AS (SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM vn WHERE vec_id % ${graft.operators.Similarity.CentroidMod} = 0),
       |asg0 AS (
       |  SELECT vn.vec_id, vn.q, vn.n2, c.cent_id,
       |         row_number() OVER (PARTITION BY vn.vec_id
       |           ORDER BY vn.n2 + c.cn2 - 2 * ${dot("vn.q", "c.cq")}, c.cent_id) AS rn
       |  FROM vn, cents c
       |),
       |asg AS (SELECT vec_id, q, n2, cent_id AS cell FROM asg0 WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, q AS qq, n2 AS qn2, cent_id AS cell
       |  FROM asg0 WHERE vec_id % ${graft.operators.Similarity.QueryMod} = 0 AND rn <= ${graft.operators.Similarity.NprobeCells}
       |),
       |scored AS (
       |  SELECT p.query_id, a.vec_id AS neighbor_id,
       |         ${cosE6(dot("p.qq", "a.q"), "p.qn2", "a.n2")} AS cos_e6
       |  FROM probes p JOIN asg a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, cos_e6,
       |         row_number() OVER (PARTITION BY query_id ORDER BY cos_e6 DESC, neighbor_id) AS rn
       |  FROM scored
       |)
       |SELECT query_id, neighbor_id, CAST(rn AS BIGINT) AS "rank", cos_e6
       |FROM ranked WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin

  /** Mirror of [[graft.operators.Similarity.semanticDedup]]: nearest-cell
    * assignment with the (d2, cell) tie-break (row_number QUALIFY == Spark's
    * min(struct)), the shared occupancy cap on collapsed cells, within-cell
    * cos >= SemThresholdE6 pairs, then the same recursive reachability closure the
    * dedup-groups oracle uses (symmetric edges, min reachable vertex = component
    * rep). Constants are interpolated from Similarity so the two sides cannot
    * drift. */
  val semanticDedup: String = {
    import graft.operators.Similarity.{SemCentroidMod, SemThresholdE6}
    // the closure CTE needs WITH RECURSIVE, which must lead the whole WITH list
    val ctes = mutantCtes.replaceFirst("^WITH ", "WITH RECURSIVE ")
    s"""$ctes,
       |cents AS (SELECT vec_id AS cent_id, q AS cq, n2 AS cn2 FROM vn WHERE vec_id % $SemCentroidMod = 0),
       |asg0 AS (
       |  SELECT vn.vec_id, vn.q, vn.n2, c.cent_id,
       |         row_number() OVER (PARTITION BY vn.vec_id
       |           ORDER BY vn.n2 + c.cn2 - 2 * ${dot("vn.q", "c.cq")}, c.cent_id) AS rn
       |  FROM vn, cents c
       |),
       |asg AS (SELECT vec_id, q, n2, cent_id AS cell FROM asg0 WHERE rn = 1),
       |asgc AS (
       |  SELECT * FROM asg
       |  QUALIFY count(*) OVER (PARTITION BY cell) <= ${graft.operators.Dedup.MaxBucketOccupancy}
       |),
       |pairs AS (
       |  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
       |  FROM asgc a JOIN asgc b ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cosE6(dot("a.q", "b.q"), "a.n2", "b.n2")} >= $SemThresholdE6
       |),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION SELECT doc_b AS src, doc_a AS dst FROM pairs
       |),
       |reach AS (
       |  SELECT vec_id AS v, vec_id AS r FROM vn
       |  UNION
       |  SELECT e.dst AS v, reach.r FROM reach JOIN edges e ON e.src = reach.v
       |),
       |comp AS (SELECT v AS vec_id, min(r) AS rep_id FROM reach GROUP BY v),
       |gs AS (SELECT rep_id, CAST(count(*) AS BIGINT) AS group_size FROM comp GROUP BY rep_id)
       |SELECT c.vec_id, c.rep_id, g.group_size,
       |       CAST(CASE WHEN c.vec_id = c.rep_id THEN 1 ELSE 0 END AS INT) AS is_canonical
       |FROM comp c JOIN gs g ON g.rep_id = c.rep_id
       |WHERE g.group_size >= 2
       |ORDER BY vec_id""".stripMargin
  }

  /** Shared CTE chain for the PQ mirrors: subvector view + PqIters unrolled Lloyd
    * rounds PER SUBSPACE, generated from the same Scala constants the operator
    * uses. Ends with `cn<iters>` (trained codebook) and `s<iters>` (final
    * assignment) available. */
  private def pqCtes: String = {
    import graft.operators.Similarity.{PqInitMod, PqIters, PqSubDim, PqSubspaces}
    def n2Of(cq: String): String =
      s"CAST(list_sum(list_transform(list_zip($cq, $cq), z -> z[1] * z[2])) AS BIGINT)"
    val subList = (0 until PqSubspaces).mkString(", ")
    val rounds = (1 to PqIters).map { i =>
      s"""a$i AS (
         |  SELECT sv.vec_id, sv.sub, sv.sq, c.cell,
         |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS d2
         |  FROM svn sv JOIN cn${i - 1} c ON c.sub = sv.sub
         |),
         |s$i AS (
         |  SELECT vec_id, sub, sq, cell FROM a$i
         |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) = 1
         |),
         |e$i AS (
         |  SELECT sub, cell, CAST(t.i AS BIGINT) AS dim, sq[t.i + 1] AS val
         |  FROM s$i, UNNEST(generate_series(0, len(sq) - 1)) AS t(i)
         |),
         |m$i AS (
         |  SELECT sub, cell, dim,
         |         CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |  FROM e$i GROUP BY sub, cell, dim
         |),
         |c$i AS (SELECT sub, cell, list(c ORDER BY dim) AS cq FROM m$i GROUP BY sub, cell),
         |cn$i AS (SELECT sub, cell, cq, ${n2Of("cq")} AS cn2 FROM c$i)""".stripMargin
    }.mkString(",\n")
    s"""$rawCtes,
       |sv AS (
       |  SELECT vec_id, CAST(t.s AS BIGINT) AS sub,
       |         q[(t.s * $PqSubDim + 1):(t.s * $PqSubDim + $PqSubDim)] AS sq
       |  FROM vn, UNNEST([$subList]) AS t(s)
       |),
       |svn AS (
       |  SELECT vec_id, sub, sq, ${n2Of("sq")} AS sn2 FROM sv
       |),
       |cn0 AS (
       |  SELECT sub, vec_id AS cell, sq AS cq, sn2 AS cn2
       |  FROM svn WHERE vec_id % $PqInitMod = 0
       |),
       |$rounds""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.pqTrain]]. */
  val pqTrain: String = {
    import graft.operators.Similarity.PqIters
    s"""$pqCtes,
       |nm AS (
       |  SELECT sub, cell, CAST(count(*) AS BIGINT) AS n_members
       |  FROM s$PqIters GROUP BY sub, cell
       |)
       |SELECT m.sub, m.cell, m.dim, m.c AS c_q, nm.n_members
       |FROM m$PqIters m JOIN nm USING (sub, cell)
       |ORDER BY sub, cell, dim""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.pqEncode]]: final assignment of every
    * subvector against the trained codebook, emitting code + residual d2. */
  val pqEncode: String = {
    import graft.operators.Similarity.PqIters
    s"""$pqCtes,
       |af AS (
       |  SELECT sv.vec_id, sv.sub, c.cell,
       |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS d2
       |  FROM svn sv JOIN cn$PqIters c ON c.sub = sv.sub
       |)
       |SELECT vec_id, sub, cell AS code, CAST(d2 AS BIGINT) AS d2
       |FROM af
       |QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) = 1
       |ORDER BY vec_id, sub""".stripMargin
  }

  /** Mirror of SparkEntry.reembedIncremental: the SAME full-corpus-trained
    * codebook as [[pqEncode]], but only the vectors whose portable hash bucket
    * ([[PortableHash.u32Sql]] of 'rb:'||vec_id, mod
    * [[graft.operators.Similarity.ReembedBuckets]]) falls in the SECOND commit
    * wave (the upper half — exactly the buckets
    * [[graft.sources.SnapshotSink.readChangesBetween]] surfaces between manifest
    * versions 1 and 2 of the two-wave embeddings commit) have their codes
    * recomputed. A consumer that re-encodes unchanged buckets, misses changed
    * ones, or trains the codebook on the changed subset instead of the committed
    * full-corpus model hash-mismatches. */
  val reembedIncremental: String = {
    import graft.operators.Similarity.{PqIters, ReembedBuckets}
    val bkt =
      s"(${PortableHash.u32Sql("'rb:' || CAST(vec_id AS VARCHAR)")} % $ReembedBuckets)"
    s"""$pqCtes,
       |af AS (
       |  SELECT sv.vec_id, sv.sub, c.cell,
       |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS d2
       |  FROM svn sv JOIN cn$PqIters c ON c.sub = sv.sub
       |),
       |enc AS (
       |  SELECT vec_id, sub, cell AS code, CAST(d2 AS BIGINT) AS d2
       |  FROM af
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) = 1
       |)
       |SELECT CAST($bkt AS INT) AS bucket, vec_id, sub, code, d2
       |FROM enc WHERE $bkt >= ${ReembedBuckets / 2}
       |ORDER BY vec_id, sub""".stripMargin
  }

  /** Mirror of Similarity.pqDrift: the pqEncode mirror wrapped as a CTE (nested
    * WITH — DuckDB-legal), rolled up per (sub, code). */
  val pqDrift: String =
    s"""WITH enc AS (
       |$pqEncode
       |)
       |SELECT sub, code, CAST(count(*) AS BIGINT) AS n_vecs,
       |       CAST(sum(d2) AS BIGINT) AS d2_sum,
       |       CAST((CAST(sum(d2) AS BIGINT) * 1000000) // count(*) AS BIGINT) AS d2_mean_e6
       |FROM enc GROUP BY sub, code ORDER BY sub, code""".stripMargin

  /** Mirror of [[graft.operators.Similarity.pqTopK]]: corpus codes + per-query
    * distance tables from the same trained codebook, ADC = sum of per-subspace
    * table entries, ranked ascending with the neighbor-id tie-break. */
  val pqTopK: String = {
    import graft.operators.Similarity.{DefaultK, PqIters, QueryMod}
    s"""$pqCtes,
       |af2 AS (
       |  SELECT sv.vec_id, sv.sub, c.cell,
       |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS d2
       |  FROM svn sv JOIN cn$PqIters c ON c.sub = sv.sub
       |),
       |codes AS (
       |  SELECT vec_id, sub, cell FROM af2
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) = 1
       |),
       |dtab AS (
       |  SELECT sv.vec_id AS query_id, sv.sub, c.cell,
       |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS dq
       |  FROM svn sv JOIN cn$PqIters c ON c.sub = sv.sub
       |  WHERE sv.vec_id % $QueryMod = 0
       |),
       |adc AS (
       |  SELECT d.query_id, co.vec_id AS neighbor_id, CAST(sum(d.dq) AS BIGINT) AS adc_d2
       |  FROM codes co JOIN dtab d ON d.sub = co.sub AND d.cell = co.cell
       |  WHERE co.vec_id <> d.query_id
       |  GROUP BY d.query_id, co.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_d2,
       |         row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
       |  FROM adc
       |)
       |SELECT query_id, CAST(rn AS BIGINT) AS "rank", neighbor_id, adc_d2
       |FROM ranked WHERE rn <= $DefaultK ORDER BY query_id, rn""".stripMargin
  }

  /** Mirror of [[graft.operators.Similarity.ivfPqTopK]]: the IVF coarse CTEs
    * (assignment + nprobe probing, ivfTopK's contract) composed with the PQ fine
    * CTEs (codes + per-query distance tables) — candidates restricted to probed
    * cells, scored by ADC, ranked ascending with the neighbor-id tie-break. */
  val ivfPqTopK: String = {
    import graft.operators.Similarity.{CentroidMod, DefaultK, NprobeCells, PqIters, QueryMod}
    s"""$pqCtes,
       |pqaf AS (
       |  SELECT sv.vec_id, sv.sub, c.cell,
       |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS d2
       |  FROM svn sv JOIN cn$PqIters c ON c.sub = sv.sub
       |),
       |codes AS (
       |  SELECT vec_id, sub, cell AS code FROM pqaf
       |  QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d2, cell) = 1
       |),
       |dtab AS (
       |  SELECT sv.vec_id AS query_id, sv.sub, c.cell AS code,
       |         sv.sn2 + c.cn2 - 2 * ${dot("sv.sq", "c.cq")} AS dq
       |  FROM svn sv JOIN cn$PqIters c ON c.sub = sv.sub
       |  WHERE sv.vec_id % $QueryMod = 0
       |),
       |icents AS (SELECT vec_id AS cent_id, q AS icq, n2 AS icn2 FROM vn WHERE vec_id % $CentroidMod = 0),
       |iasg0 AS (
       |  SELECT vn.vec_id, c.cent_id,
       |         row_number() OVER (PARTITION BY vn.vec_id
       |           ORDER BY vn.n2 + c.icn2 - 2 * ${dot("vn.q", "c.icq")}, c.cent_id) AS rn
       |  FROM vn, icents c
       |),
       |iasg AS (SELECT vec_id, cent_id AS cell FROM iasg0 WHERE rn = 1),
       |probes AS (
       |  SELECT vec_id AS query_id, cent_id AS cell
       |  FROM iasg0 WHERE vec_id % $QueryMod = 0 AND rn <= $NprobeCells
       |),
       |cand AS (
       |  SELECT p.query_id, a.vec_id
       |  FROM probes p JOIN iasg a ON a.cell = p.cell AND a.vec_id <> p.query_id
       |),
       |adc AS (
       |  SELECT ca.query_id, ca.vec_id AS neighbor_id, CAST(sum(d.dq) AS BIGINT) AS adc_d2
       |  FROM cand ca
       |  JOIN codes co ON co.vec_id = ca.vec_id
       |  JOIN dtab d ON d.query_id = ca.query_id AND d.sub = co.sub AND d.code = co.code
       |  GROUP BY ca.query_id, ca.vec_id
       |),
       |ranked AS (
       |  SELECT query_id, neighbor_id, adc_d2,
       |         row_number() OVER (PARTITION BY query_id ORDER BY adc_d2, neighbor_id) AS rn
       |  FROM adc
       |)
       |SELECT query_id, CAST(rn AS BIGINT) AS "rank", neighbor_id, adc_d2
       |FROM ranked WHERE rn <= $DefaultK ORDER BY query_id, rn""".stripMargin
  }

  /** Mirror of Similarity.ivfTrain: KmIters unrolled Lloyd rounds in exact
    * arithmetic — integer squared-L2 assignment with (d2, cell) tie-breaking
    * (row_number QUALIFY == Spark's min(struct)), floor-of-double per-dim means,
    * centroid norms recomputed from the floored means. Round CTEs are GENERATED
    * from the same Similarity constants the Spark loop runs on, so iteration
    * count and init modulus cannot drift. */
  val ivfTrain: String = {
    import graft.operators.Similarity.{KmInitMod, KmIters}
    def n2Of(cq: String): String =
      s"CAST(list_sum(list_transform(list_zip($cq, $cq), z -> z[1] * z[2])) AS BIGINT)"
    val rounds = (1 to KmIters).map { i =>
      s"""a$i AS (
         |  SELECT vn.vec_id, vn.q, c.cell,
         |         vn.n2 + c.cn2 - 2 * ${dot("vn.q", "c.cq")} AS d2
         |  FROM vn, cn${i - 1} c
         |),
         |s$i AS (
         |  SELECT vec_id, q, cell FROM a$i
         |  QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) = 1
         |),
         |e$i AS (
         |  SELECT cell, t.i AS dim, q[t.i + 1] AS val
         |  FROM s$i, UNNEST(generate_series(0, len(q) - 1)) AS t(i)
         |),
         |m$i AS (
         |  SELECT cell, dim, CAST(floor(CAST(sum(val) AS DOUBLE) / count(*)) AS BIGINT) AS c
         |  FROM e$i GROUP BY cell, dim
         |),
         |c$i AS (SELECT cell, list(c ORDER BY dim) AS cq FROM m$i GROUP BY cell),
         |cn$i AS (SELECT cell, cq, ${n2Of("cq")} AS cn2 FROM c$i)""".stripMargin
    }.mkString(",\n")
    s"""$rawCtes,
       |cn0 AS (SELECT vec_id AS cell, q AS cq, n2 AS cn2 FROM vn WHERE vec_id % $KmInitMod = 0),
       |$rounds,
       |nm AS (SELECT cell, CAST(count(*) AS BIGINT) AS n_members FROM s$KmIters GROUP BY cell)
       |SELECT m.cell, m.dim, m.c AS c_q, nm.n_members
       |FROM m$KmIters m JOIN nm USING (cell)
       |ORDER BY cell, dim""".stripMargin
  }
}
