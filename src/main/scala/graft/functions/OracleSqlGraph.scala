package graft.functions

/** DuckDB oracles for the link-graph family ([[graft.operators.LinkGraph]]).
  *
  * The PageRank mirrors unroll [[graft.operators.LinkGraph.PrIters]] rounds as
  * generated CTEs from the SAME Scala constants the Spark loop runs on (the
  * ivf_train/pq_train pattern), parameterized by the edge-source CTE — the
  * synthesized md5 graph and the REAL anchor-extracted graph share one
  * generator, so the two registered queries cannot drift from each other or
  * from the Spark side. All divisions are DuckDB `//` (floor) on non-negative
  * BIGINTs == Spark `DIV` (truncate) on the same values; rank sums are CAST
  * back to BIGINT (DuckDB's sum(BIGINT) widens to HUGEINT, Spark's stays long —
  * total rank mass is ~PrScale so the values fit).
  */
object OracleSqlGraph {

  import graft.operators.LinkGraph.{PrDampDen, PrDampNum, PrIters, PrOutMod, PrScale, PrTopK}

  /** The full PageRank SQL over an edge CTE named `edgesCte` supplying (src, dst)
    * rows (multi-edges = multiple shares); out-degree derived by count, exactly
    * like [[graft.operators.LinkGraph.pagerankOver]]. */
  private def prSql(prefixCtes: String, edgesCte: String): String = {
    val teleNum = PrDampDen - PrDampNum
    val rounds = (1 to PrIters).map { i =>
      s"""r$i AS (
         |  SELECT d.doc_id AS v,
         |         CAST((SELECT tele FROM par)
         |              + ($PrDampNum * coalesce(s.s, 0)) // $PrDampDen AS BIGINT) AS r
         |  FROM documents d LEFT JOIN (
         |    SELECT e.dst, sum(p.r // e.outdeg) AS s
         |    FROM e JOIN r${i - 1} p ON e.src = p.v GROUP BY e.dst
         |  ) s ON d.doc_id = s.dst
         |)""".stripMargin
    }.mkString(",\n")
    s"""$prefixCtes,
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |par AS (SELECT n, $PrScale // n AS base,
       |               (($PrScale // n) * $teleNum) // $PrDampDen AS tele FROM nn),
       |dg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM $edgesCte GROUP BY src),
       |e AS (SELECT a.src, a.dst, d.outdeg FROM $edgesCte a JOIN dg d USING (src)),
       |r0 AS (SELECT doc_id AS v, (SELECT base FROM par) AS r FROM documents),
       |$rounds,
       |nin AS (SELECT dst, CAST(count(*) AS BIGINT) AS n_in FROM e GROUP BY dst)
       |SELECT r.v AS doc_id,
       |       coalesce(dg.outdeg, 0) AS n_out,
       |       coalesce(nin.n_in, 0) AS n_in,
       |       r.r AS rank_e12
       |FROM r$PrIters r
       |LEFT JOIN dg ON dg.src = r.v
       |LEFT JOIN nin ON nin.dst = r.v
       |ORDER BY rank_e12 DESC, doc_id LIMIT $PrTopK""".stripMargin
  }

  /** Synthesized-graph edge CTEs (the md5 rule, mirroring LinkGraph.edges). */
  private val synthCtes: String = {
    val u32 = PortableHash.u32Sql _
    s"""WITH sdeg AS (
       |  SELECT doc_id AS src,
       |         1 + ${u32("'prd:' || CAST(doc_id AS VARCHAR)")} % $PrOutMod AS odeg
       |  FROM documents
       |),
       |sedges AS (
       |  SELECT src,
       |         ${u32("'pr:' || CAST(src AS VARCHAR) || ':' || CAST(t.j AS VARCHAR)")}
       |           % (SELECT CAST(count(*) AS BIGINT) FROM documents) AS dst
       |  FROM sdeg, UNNEST(generate_series(0, odeg - 1)) AS t(j)
       |)""".stripMargin
  }

  /** Anchor-extracted edge CTEs: the raw `<a href="uK">` markup from the
    * interleave mirror's tspans, one (src, dst) row per anchor occurrence —
    * mirroring LinkGraph.anchorEdgesRaw over Interleave.spansFlat. */
  private val anchorCtes: String =
    s"""${OracleSql.extractionCtes},
       |aedges AS (
       |  SELECT CAST(substr(t.doc_id, 5) AS BIGINT) AS src,
       |         CAST(u.u AS BIGINT) AS dst
       |  FROM tspans t, UNNEST(regexp_extract_all(t.text, 'href="u(\\d+)"', 1)) AS u(u)
       |)""".stripMargin

  val pagerank: String = prSql(synthCtes, "sedges")

  val anchorEdges: String =
    s"""$anchorCtes
       |SELECT src, dst, CAST(count(*) AS BIGINT) AS n_anchors
       |FROM aedges GROUP BY src, dst ORDER BY src, dst""".stripMargin

  val pagerankAnchors: String = prSql(anchorCtes, "aedges")
}
