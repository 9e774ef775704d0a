package graft

import graft.operators.Hygiene
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/**
 * Two-tier Bloom decontamination ([[Hygiene.decontaminateBloom]]): byte-identical
 * to the exact broadcast-join form — at the production fpp AND at an absurd
 * fpp=0.5, because the exact second tier removes every Bloom false positive. The
 * identity must be non-vacuous: the corpus must contain both contaminated and
 * clean documents.
 */
class HygieneBloomSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("bloom form is byte-identical to the exact form, even at fpp = 0.5") {
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    val exact = canon(Hygiene.decontaminate(documents))
    assert(canon(Hygiene.decontaminateBloom(documents)) === exact)
    assert(canon(Hygiene.decontaminateBloom(documents, fpp = 0.5)) === exact)
    // non-vacuous on this corpus: both classes present
    val flags = exact.map(_.split('|').last).toSet
    assert(flags === Set("0", "1"))
  }
}
