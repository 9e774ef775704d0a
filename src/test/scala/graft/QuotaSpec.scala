package graft

import java.security.MessageDigest

import graft.operators.Curation
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Per-source document quota ([[Curation.sourceQuota]]): deterministic hash-priority
 * top-Q per crawl source. Verified against a single-threaded md5-rank oracle, proven
 * chunk-count invariant (the two-stage rank is an implementation detail, never a
 * semantics knob), and exercised on the shapes the sf corpus lacks: a below-quota
 * source (kept whole) and a mega-source (the skew case the two-stage rank exists for).
 */
class QuotaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def key(docId: Long): String =
    md5hex(s"${Curation.QuotaSalt}:$docId").take(8)

  private def quotaSet(df: DataFrame): Set[(Long, String, String, Long)] =
    df.collect().map(r =>
      (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSet

  /** Single-threaded oracle over any (doc_id, source) list. */
  private def expected(rows: Seq[(Long, String)],
      quota: Long): Set[(Long, String, String, Long)] =
    rows.groupBy(_._2).flatMap { case (source, ms) =>
      ms.map(m => (m._1, key(m._1)))
        .sortBy { case (id, k) => (k, id) }
        .take(quota.toInt).zipWithIndex
        .map { case ((id, k), i) => (id, source, k, (i + 1).toLong) }
    }.toSet

  test("source_quota equals the single-threaded md5-rank oracle") {
    val rows = documents.select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = quotaSet(Curation.sourceQuota(documents))
    assert(got === expected(rows, Curation.SourceQuota))
    // non-vacuous: the sf corpus's 25-doc sources are truncated to the quota
    assert(got.nonEmpty && got.groupBy(_._2).values.forall(_.size == Curation.SourceQuota))
  }

  test("output is invariant to the chunk fan-out (1 / 7 / 64 agree)") {
    val runs = Seq(1, 7, 64).map(n =>
      quotaSet(Curation.sourceQuota(documents, nChunks = n)))
    assert(runs.distinct.size === 1)
  }

  test("a below-quota source is kept whole; a mega-source is capped, byte-identical " +
      "to the single-window path") {
    val extra = spark.range(0, 100000)
      .select((lit(800000L) + col("id")).as("doc_id"),
        when(col("id") < 3, lit("tiny_src")).otherwise(lit("mega_src")).as("source"))
    val injected = documents.select(col("doc_id"), col("source")).unionByName(extra)
    val twoStage = quotaSet(Curation.sourceQuota(injected))
    // semantics: identical to a degenerate single-chunk (global-window) run
    assert(twoStage === quotaSet(Curation.sourceQuota(injected, nChunks = 1)))
    val bySource = twoStage.groupBy(_._2)
    assert(bySource("tiny_src").map(t => (t._1, t._4)).toList.sortBy(_._2)
      .map(_._2) === List(1L, 2L, 3L)) // all 3 kept, densely ranked
    assert(bySource("mega_src").size === Curation.SourceQuota.toInt)
  }
}
