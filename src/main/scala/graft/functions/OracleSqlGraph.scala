package graft.functions

/** DuckDB oracle for the link-graph family ([[graft.operators.LinkGraph]]).
  *
  * The PageRank mirror unrolls [[graft.operators.LinkGraph.PrIters]] rounds as
  * generated CTEs from the SAME Scala constants the Spark loop runs on (the
  * ivf_train/pq_train pattern), so iteration count, damping, scale, and the md5
  * graph-synthesis rule cannot drift between the two sides. All divisions are
  * DuckDB `//` (floor) on non-negative BIGINTs == Spark `DIV` (truncate) on the
  * same values; rank sums are CAST back to BIGINT (DuckDB's sum(BIGINT) widens to
  * HUGEINT, Spark's stays long — total rank mass is ~PrScale so the values fit).
  */
object OracleSqlGraph {

  val pagerank: String = {
    import graft.operators.LinkGraph.{PrDampDen, PrDampNum, PrIters, PrOutMod, PrScale, PrTopK}
    def u32(s: String): String = PortableHash.u32Sql(s)
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
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       |par AS (SELECT n, $PrScale // n AS base,
       |               (($PrScale // n) * $teleNum) // $PrDampDen AS tele FROM nn),
       |deg AS (
       |  SELECT doc_id AS src,
       |         1 + ${u32("'prd:' || CAST(doc_id AS VARCHAR)")} % $PrOutMod AS outdeg
       |  FROM documents
       |),
       |e AS (
       |  SELECT src, outdeg,
       |         ${u32("'pr:' || CAST(src AS VARCHAR) || ':' || CAST(t.j AS VARCHAR)")}
       |           % (SELECT n FROM par) AS dst
       |  FROM deg, UNNEST(generate_series(0, outdeg - 1)) AS t(j)
       |),
       |r0 AS (SELECT doc_id AS v, (SELECT base FROM par) AS r FROM documents),
       |$rounds,
       |nin AS (SELECT dst, CAST(count(*) AS BIGINT) AS n_in FROM e GROUP BY dst)
       |SELECT r.v AS doc_id,
       |       CAST(deg.outdeg AS BIGINT) AS n_out,
       |       coalesce(nin.n_in, 0) AS n_in,
       |       r.r AS rank_e12
       |FROM r$PrIters r
       |JOIN deg ON deg.src = r.v
       |LEFT JOIN nin ON nin.dst = r.v
       |ORDER BY rank_e12 DESC, doc_id LIMIT $PrTopK""".stripMargin
  }
}
