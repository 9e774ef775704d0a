package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Sparse lexical retrieval — BM25 top-k over the corpus for a fixed query set. The
 * retrieval counterpart to the dense ANN stack (`ann_topk`/`ivf_topk`/`ivfpq_topk`):
 * together they are the two halves of every production corpus-search deployment
 * (and of retrieval-based decontamination audits: "which training docs score
 * suspiciously high against this eval question").
 *
 * Scoring is BM25 with k1 = 6/5, b = 3/4 in EXACT integer arithmetic:
 *  - idf_e6 = ((2N - 2df + 1) * 1e6) DIV (2df + 1) — the standard
 *    (N - df + 0.5)/(df + 0.5) idf as a ×2-cleared rational, WITHOUT the log: both
 *    engines' libm logs round differently at the last ulp, so the gate pins the
 *    monotone-identical rational form (same move as top_terms' no-log tf-idf).
 *  - tfn_e6 = (22·L·tf · 1e6) DIV (10·L·tf + 3·L + 9·dl·N) — the closed form of
 *    tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) with avgdl = L/N cleared through
 *    (k1 = 6/5, b = 3/4 ⇒ ×(10·L) clears every denominator).
 *  - per-term score_e6 = (idf_e6 · tfn_e6) DIV 1e6, summed over matched terms.
 * Intermediate magnitudes stay under 2^63 at any tested SF; a 10^12-doc deployment
 * lifts the two products to DECIMAL(38,0) (DuckDB: HUGEINT) — same arithmetic, wider
 * lanes.
 *
 * Scale shape: the corpus-side term stream is FILTERED TO QUERY TERMS before any
 * aggregation (the inverted-index access pattern without materializing an index —
 * a scan with a pushed semi-filter), so the tf table is O(matching postings), not
 * O(corpus vocabulary). The query dimension broadcasts; df is a tiny agg over the
 * restricted tf; the final per-query top-k is the bounded [[TopKAgg]] (map-side
 * partials, O(k·partitions) shuffle — never a Window sort over all candidates).
 */
object Retrieval {

  /** Fixed query set (query_id -> terms), drawn from the synthetic generator's
    * vocabulary; the oracle SQL interpolates THIS list (single-sourced). Terms
    * are pinned to [a-z]+ (checked at init below): the oracle interpolates them
    * into SQL string literals, so a quote or metacharacter here would silently
    * alter the generated oracle (ADVICE r4). */
  val Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("key", "data", "row"),
    2 -> Seq("window", "agg", "spark"),
    3 -> Seq("customer", "query"),
    4 -> Seq("hash", "join", "table"),
    5 -> Seq("slow", "fast", "scan"))

  require(Queries.flatMap(_._2).forall(_.matches("[a-z]+")),
    "BM25 query terms must match [a-z]+ — they are interpolated into oracle SQL " +
      "literals; extend the escaping in OracleSqlText.bm25TopK before widening")

  /** Results per query. */
  val BmK = 5

  def bm25TopK(documents: DataFrame): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    // corpus scalars (N docs, L total tokens, max doc length): one tiny job
    val stats = documents
      .agg(count(lit(1)), sum(size(split(col("text"), " ")).cast("long")),
        max(size(split(col("text"), " ")).cast("long"))).head()
    val n = stats.getLong(0)
    require(n > 0, "bm25TopK requires a non-empty corpus") // sum(empty) is null
    val l = stats.getLong(1)
    val maxDl = stats.getLong(2)
    // Overflow guard (ADVICE r4): the ×(10·L)-cleared rational wraps silently in
    // Spark's Long arithmetic once its terms pass 2^63 (DuckDB raises instead — a
    // DIVERGENT failure mode). tf <= dl <= maxDl bounds every term: numerator
    // 22·L·tf·1e6 <= 22·L·maxDl·1e6, denominator <= 10·L·maxDl + 3·L + 9·maxDl·N.
    // Checked in BigInt so the guard itself cannot wrap; corpora beyond it lift
    // the two products to DECIMAL(38,0) (HUGEINT in DuckDB) — same arithmetic,
    // wider lanes (scaladoc above).
    val worst = Seq(
      BigInt(22) * l * maxDl * 1000000L,
      BigInt(10) * l * maxDl + BigInt(3) * l + BigInt(9) * maxDl * n)
    require(worst.forall(_ <= Long.MaxValue),
      s"bm25TopK integer scoring would overflow Long at this corpus size " +
        s"(N=$n, L=$l, maxDl=$maxDl) — lift idf_e6/tfn_e6 to DECIMAL(38,0)")
    val qterms = Queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("q_id", "term")
    val qset = Queries.flatMap(_._2).distinct
    val tf = documents
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      // postings-only BEFORE the explode: the generator emits one row per query-term
      // HIT, not one per corpus token (a 20-term query set against a 10^12-token
      // corpus generates ~0.1% of the rows the explode-then-filter form would)
      .select(col("doc_id"), size(col("t")).cast("long").as("dl"),
        explode(filter(col("t"), x => x.isin(qset: _*))).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term")).agg(count(lit(1)).as("tf"))
    // tf is distinct on (doc_id, term) by construction: df is a plain count
    val dfx = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val topk = udaf(new TopKAgg(BmK))
    tf.join(dfx, Seq("term")).join(broadcast(qterms), Seq("term"))
      .withColumn("idf_e6", expr(s"((2 * $n - 2 * df + 1) * 1000000) DIV (2 * df + 1)"))
      .withColumn("tfn_e6",
        expr(s"(22 * $l * tf * 1000000) DIV (10 * $l * tf + 3 * $l + 9 * dl * $n)"))
      .withColumn("term_score", expr("(idf_e6 * tfn_e6) DIV 1000000"))
      .groupBy(col("q_id"), col("doc_id"))
      .agg(sum(col("term_score")).as("score_e6"))
      .groupBy(col("q_id"))
      .agg(topk(col("score_e6"), col("doc_id")).as("tk"))
      .select(col("q_id"), posexplode(col("tk.items")))
      .select(col("q_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("doc_id"), col("col.cos_e6").as("score_e6"))
      .orderBy(col("q_id"), col("rk"))
  }
}
