package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Property fuzz for the text-model expressions over ADVERSARIAL strings the real
 * corpus never produces — empty strings, runs of spaces (empty tokens), 1- and
 * 2-char texts (the sequence(1,0)-descends guard), repeated characters, and
 * tokens that collide into identical hash buckets. Each Spark expression must
 * equal the single-threaded JVM re-implementation on every generated row
 * (deterministic seed — failures reproduce).
 */
class TextModelPropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val genText: Gen[String] = for {
    n <- Gen.choose(0, 40)
    cs <- Gen.listOfN(n, Gen.frequency(
      6 -> Gen.oneOf('a', 'b', 'c', 'k', 'z'),
      3 -> Gen.const(' '),
      1 -> Gen.oneOf('.', '_', '"')))
  } yield cs.mkString

  private def corpus(seed: Long, rows: Int): Seq[(Long, String)] =
    Gen.listOfN(rows, genText).pureApply(Gen.Parameters.default, Seed(seed))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }

  private def tris(t: String): Seq[String] =
    if (t.length < 3) Seq.empty else (0 to t.length - 3).map(i => t.substring(i, i + 3))

  test("charTrigrams == JVM trigrams on adversarial strings") {
    import spark.implicits._
    val rows = corpus(seed = 11L, rows = 300)
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"), TextAnalysis.charTrigrams(col("text")).as("t"))
      .as[(Long, Seq[String])].collect().toMap
    rows.foreach { case (id, t) =>
      assert(got(id) === tris(t), s"doc $id text='$t'")
    }
  }

  test("TrigramTfExpr counts == JVM occurrence counts (incl. multi-byte chars)") {
    import spark.implicits._
    val genUni: Gen[String] = for {
      n <- Gen.choose(0, 30)
      cs <- Gen.listOfN(n, Gen.frequency(
        5 -> Gen.oneOf('a', 'b', ' '),
        2 -> Gen.oneOf('é', 'へ', 'Ω'), // 2- and 3-byte UTF-8: boundary walk
        1 -> Gen.const('"')))
    } yield cs.mkString
    val rows = Gen.listOfN(200, genUni).pureApply(Gen.Parameters.default, Seed(17L))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TrigramTfExpr(col("text")).as("tf"))
      .as[(Long, Seq[(String, Long)])].collect().toMap
    rows.foreach { case (id, t) =>
      val expected = tris(t).groupBy(identity)
        .map { case (k, v) => (k, v.size.toLong) }.toSeq.sortBy(_._1)
      // Spark sorts by UTF8String binary order == UTF-8 byte order; Scala's
      // String sort is UTF-16 order — equal here (no surrogates in the alphabet),
      // so compare as sorted sets of pairs to stay alphabet-agnostic
      assert(got(id).sortBy(_._1) === expected.sortBy(_._1), s"doc $id text='$t'")
    }
  }

  test("classifier margin == JVM feature-weight sum on adversarial strings") {
    import spark.implicits._
    def weight(f: String): Long = {
      val bucket = TestHash.u32("fh:" + f) % TextAnalysis.ClsBuckets
      TestHash.u32("fw:" + bucket) % TextAnalysis.ClsWeightMod - 1000L
    }
    val rows = corpus(seed = 13L, rows = 300)
    val got = TextAnalysis.classifierScored(
        rows.toDF("doc_id", "text").withColumn("lang", lit("xx")))
      .select(col("doc_id"), col("n_feats"), col("score"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, t) =>
      val toks = t.split(" ", -1).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(p => p(0) + "_" + p(1))
      assert(got(id) === ((feats.size.toLong, feats.map(weight).sum)),
        s"doc $id text='$t'")
    }
  }
}
