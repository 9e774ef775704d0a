package graft

import graft.operators.Packing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Sequence packing: the distributed two-level prefix sum must equal the sequential
 * definition (concatenate in doc_id order, chunk at Capacity tokens) for any bucket
 * count and for sparse/non-dense id spaces — bucketing is an implementation detail
 * that must never show through in the output.
 */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  private def reference(docs: Seq[(Long, Long)], cap: Long): Map[Long, (Long, Long, Long, Long)] = {
    var cum = 0L
    docs.sortBy(_._1).map { case (id, n) =>
      val before = cum; cum += n
      id -> (n, before / cap, (before + n - 1) / cap, before % cap)
    }.toMap
  }

  private def collectPack(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("seqPack equals the sequential concat-and-chunk definition") {
    val toks = documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = reference(toks, Packing.Capacity)
    val got = collectPack(Packing.seqPack(documents))
    assert(got === expected)
    // sanity on the fixture itself: documents genuinely straddle window boundaries
    assert(got.values.exists(v => v._3 > v._2), "expected straddling docs")
  }

  test("bucket count is invisible: 1, 7, and 64 buckets agree") {
    val b64 = collectPack(Packing.seqPack(documents, nBuckets = 64))
    assert(collectPack(Packing.seqPack(documents, nBuckets = 1)) === b64)
    assert(collectPack(Packing.seqPack(documents, nBuckets = 7)) === b64)
  }

  test("shuffled packing equals the sequential definition over the md5 permutation") {
    val keyed = documents
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"),
        substring(md5(concat_ws(":", lit(Packing.ShuffleSalt),
          col("doc_id").cast("string"))), 1, 8).as("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    var cum = 0L
    val cap = Packing.Capacity
    val expected = keyed.sortBy(t => (t._3, t._1)).map { case (id, n, k) =>
      val before = cum; cum += n
      id -> (n, k, before / cap, (before + n - 1) / cap, before % cap)
    }.toMap
    val got = Packing.seqPackShuffled(documents).collect().map(r =>
      r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    assert(got === expected)
    // the permutation is non-trivial: shuffled order differs from id order
    val idOrder = keyed.map(_._1).sorted
    val shufOrder = keyed.sortBy(t => (t._3, t._1)).map(_._1)
    assert(idOrder !== shufOrder)
  }

  test("property: random sparse corpora pack identically to the sequential reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // fixed-seed sampling (scalatest+scalacheck bridge not in the offline cache)
    val genCorpus: Gen[List[(Long, Int)]] = Gen.listOfN(60, for {
      id <- Gen.chooseNum(0L, 5000000L)
      nTok <- Gen.chooseNum(1, 40)
    } yield (id, nTok))
    (1 to 8).foreach { i =>
      val corpus = genCorpus(Gen.Parameters.default, Seed(i.toLong)).get
        .distinctBy(_._1)
      val docs = corpus.map { case (id, n) =>
        (id, Seq.fill(n)("w").mkString(" "))
      }.toDF("doc_id", "text")
      val cap = 1L + (i % 5) * 7L // vary capacity too
      val expected = reference(corpus.map { case (id, n) => (id, n.toLong) }, cap)
      assert(collectPack(Packing.seqPack(docs, capacity = cap, nBuckets = 5))
        === expected, s"seed $i")
    }
  }

  test("pack plan: one bucket-hash exchange feeds the window; text never scanned twice") {
    // the two-level scan's whole point is that the window partitions by bucket —
    // a plan that fell back to a global Window.orderBy would show a single-partition
    // exchange. Assert the window's exchange is hash partitioning (by bucket), not
    // a SinglePartition.
    val plan = Packing.seqPack(documents).queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "global single-partition window defeats the two-level prefix sum")
  }

  test("sparse non-dense ids pack in id order") {
    import spark.implicits._
    val sparse = Seq(
      (100000L, "a b c"), (5L, "one two"), (7777L, "x")
    ).toDF("doc_id", "text")
    val got = collectPack(Packing.seqPack(sparse, capacity = 4L))
    // order 5, 7777, 100000 with token counts 2, 1, 3 and capacity 4:
    assert(got === Map(
      5L -> (2L, 0L, 0L, 0L),      // tokens [0,2)
      7777L -> (1L, 0L, 0L, 2L),   // token  [2,3)
      100000L -> (3L, 0L, 1L, 3L)  // tokens [3,6) straddles windows 0..1
    ))
  }
}
