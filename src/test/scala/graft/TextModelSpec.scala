package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The two model-shaped text operators: trigram-LM fluency scoring (the CCNet
 * perplexity-filter slot) and hashed-linear-classifier inference (the fastText
 * quality-filter slot). Both are differential against single-threaded
 * re-implementations of the same integer contracts, plus the semantic sanity
 * checks that make the scores mean something (repetitive text scores high under
 * the LM; the classifier margin is exactly the sum of its feature weights).
 */
class TextModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  private def u32(s: String): Long = TestHash.u32(s)

  // ---- lm_score ----------------------------------------------------------------

  private def tris(t: String): Seq[String] =
    if (t.length < 3) Seq.empty else (0 to t.length - 3).map(i => t.substring(i, i + 3))

  test("lmScore equals the single-threaded trigram-model oracle exactly") {
    val corpus = documents.select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val cTri = corpus.flatMap(d => tris(d._3)).groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val cBi = cTri.groupBy(_._1.substring(0, 2))
      .map { case (k, v) => k -> (v.values.sum, v.size.toLong) }
    val pE6 = cTri.map { case (tri, c) =>
      val (cb, tb) = cBi(tri.substring(0, 2))
      tri -> c * TextAnalysis.LmProbScale / (cb + tb) }
    val expected = corpus.filter(_._3.length >= 3).map { case (id, lang, t) =>
      val ts = tris(t)
      (id, lang, ts.size.toLong, ts.map(pE6).sum / ts.size)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.lmScore(documents)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("repetitive text outscores high-entropy text under the trigram LM") {
    import spark.implicits._
    val docs = Seq(
      (0L, "ababababababababababababab", "en"),
      (1L, "qwzxjvkpfyhgdnmrtlsbceuioa", "en"), // all-distinct trigrams
      (2L, "ababab zxqwk ababab zxqwk ababab", "en")
    ).toDF("doc_id", "text", "lang")
    val scores = TextAnalysis.lmScore(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(scores(0L) > scores(1L), "pure repetition must beat pure novelty")
    assert(scores(2L) > scores(1L) && scores(2L) < scores(0L))
  }

  test("charTrigrams guards Spark's descending sequence(1, 0) on short strings") {
    import spark.implicits._
    val got = Seq("ab", "", "abc").toDF("text")
      .select(size(TextAnalysis.charTrigrams(col("text")))).as[Int].collect()
    assert(got.toSeq === Seq(0, 0, 1))
  }

  // ---- dsir_weights --------------------------------------------------------------

  /** Single-threaded Witten-Bell model: tri -> p_e6. */
  private def modelOf(texts: Seq[String]): Map[String, Long] = {
    val ct = texts.flatMap(tris).groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val cb = ct.groupBy(_._1.substring(0, 2))
      .map { case (k, v) => k -> (v.values.sum, v.size.toLong) }
    ct.map { case (tri, c) =>
      val (s, t) = cb(tri.substring(0, 2))
      tri -> c * TextAnalysis.LmProbScale / (s + t)
    }
  }

  test("dsirWeights equals the single-threaded two-model oracle exactly") {
    val corpus = documents.select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val sm = modelOf(corpus.map(_._3))
    val tm = modelOf(corpus.filter(_._2 == TextAnalysis.DsirTargetLang).map(_._3))
    val expected = corpus.map { case (id, lang, t) =>
      val ts = tris(t)
      val n = ts.size.toLong
      val tSc = ts.map(tm.getOrElse(_, 0L)).sum / n
      val sSc = ts.map(sm).sum / n
      val w = tSc * 1000000L / math.max(sSc, 1L)
      val sampled =
        if (u32(s"${TextAnalysis.DsirSampleSalt}:$id") % 1000000L < math.min(w, 1000000L)) 1 else 0
      (id, lang, n, tSc, sSc, w, sampled)
    }.sortBy(_._1)
    val got = TextAnalysis.dsirWeights(documents).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getInt(6))).toSeq
    assert(got === expected)
  }

  test("target-like text outweighs out-of-target junk") {
    import spark.implicits._
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en"),
      (1L, "the quick brown fox jumps again and again", "en"),
      (2L, "the quick brown fox jumps over me", "xx"), // target-like, foreign label
      (3L, "zzyzx qqqq wvwvw kjkjkj plplpl", "xx")     // out-of-target junk
    ).toDF("doc_id", "text", "lang")
    val w = TextAnalysis.dsirWeights(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(5)).toMap
    assert(w(2L) > w(3L),
      s"target-like doc must outweigh junk: $w — junk trigrams are absent from " +
        "the target model and contribute 0")
  }

  // ---- classifier_score ---------------------------------------------------------

  private def weight(f: String): Long = {
    val bucket = u32("fh:" + f) % TextAnalysis.ClsBuckets
    u32("fw:" + bucket) % TextAnalysis.ClsWeightMod - 1000L
  }

  test("classifierScore equals the single-threaded hashed-linear oracle exactly") {
    val corpus = documents.select(col("doc_id"), col("lang"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val expected = corpus.map { case (id, lang, t) =>
      val toks = t.split(" ", -1).toSeq
      val feats = toks ++ toks.sliding(2).filter(_.size == 2).map(p => p(0) + "_" + p(1))
      val score = feats.map(weight).sum
      (id, lang, feats.size.toLong, score, if (score > 0) 1 else 0)
    }.sortBy(_._1).toSeq
    val got = TextAnalysis.classifierScore(documents)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getInt(4)))
      .toSeq
    assert(got === expected)
  }

  test("classifier inference plan carries no shuffle besides the output ordering") {
    val plan = TextAnalysis.classifierScore(documents)
      .queryExecution.executedPlan.toString()
    // one rangepartitioning exchange for the contract's total order; the scoring
    // itself (feature extraction + weight sum) must be exchange-free
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("single-token docs get no bigrams and still score (slice-length-0 edge)") {
    import spark.implicits._
    val got = TextAnalysis.classifierScore(
        Seq((0L, "solo", "en")).toDF("doc_id", "text", "lang"))
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(got._1 === 1L)
    assert(got._2 === weight("solo"))
  }
}
