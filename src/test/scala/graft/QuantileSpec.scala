package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Histogram-based exact quantiles ([[TextAnalysis.tokenQuantiles]]): the
 * inverted-CDF (type-1) convention is pinned against a single-threaded
 * sort-and-index oracle — on the real sf corpus and on handcrafted distributions
 * (duplicates, a 1..10 ladder) where each expected index is computable by hand.
 */
class QuantileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  /** type-1 quantile: smallest value at cumulative rank ceil(q*n/100), 1-based. */
  private def expected(vals: Map[String, Seq[Long]])
      : Seq[(String, Long, Long, Long)] =
    vals.toSeq.flatMap { case (lang, vs) =>
      val s = vs.sorted
      TextAnalysis.QuantilePoints.map { q =>
        val idx = (q.toLong * s.size + 99) / 100 // = ceil(q*n/100), all-integer
        (lang, q.toLong, s.size.toLong, s(idx.toInt - 1))
      }
    }.sortBy(t => (t._1, t._2))

  private def got(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
    df.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq

  test("token_quantiles equals the sort-and-index oracle on the sf corpus") {
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    // feed the oracle the SAME per-doc metric column (tokenization is gated by the
    // token_stats/text_quality oracles; this spec isolates the quantile machinery)
    val perDoc = documents
      .select(col("lang"), TextAnalysis.qualityMetrics(col("text")).nTok.as("v"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val vals = perDoc.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got(TextAnalysis.tokenQuantiles(documents)) === expected(vals))
  }

  test("convention pins: 1..10 ladder and a duplicate-heavy distribution") {
    import spark.implicits._
    // lang "a": texts of 1..10 tokens -> p25=3, p50=5, p75=8, p90=9, p99=10
    // lang "b": token counts [1,1,1,1,2] -> p25..p75 all 1 (rank<=4), p90/p99=2
    val docs = ((1 to 10).map(n => ("a", Seq.fill(n)("w").mkString(" ")))
      ++ Seq.fill(4)(("b", "w")) :+ ("b", "w w"))
      .toDF("lang", "text")
    assert(got(TextAnalysis.tokenQuantiles(docs)) === Seq(
      ("a", 25L, 10L, 3L), ("a", 50L, 10L, 5L), ("a", 75L, 10L, 8L),
      ("a", 90L, 10L, 9L), ("a", 99L, 10L, 10L),
      ("b", 25L, 5L, 1L), ("b", 50L, 5L, 1L), ("b", 75L, 5L, 1L),
      ("b", 90L, 5L, 2L), ("b", 99L, 5L, 2L)))
  }
}
