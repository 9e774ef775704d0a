package graft

import graft.operators.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * BM25 retrieval: differential against a single-threaded re-implementation of the
 * exact-integer scoring contract, a relevance sanity check on a constructed corpus,
 * and the plan-shape claim (bounded top-k aggregation, not a Window sort over
 * candidates).
 */
class RetrievalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  /** Single-threaded BM25 with the same integer contract. */
  private def reference(corpus: Seq[(Long, String)]): Seq[(Int, Long, Long, Long)] = {
    val toks = corpus.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = corpus.size.toLong
    val l = toks.values.map(_.size.toLong).sum
    val qset = Retrieval.Queries.flatMap(_._2).toSet
    val tf = corpus.flatMap { case (id, _) =>
      toks(id).filter(qset).groupBy(identity).map { case (t, o) => (id, t, o.size.toLong) }
    }
    val df = tf.groupBy(_._2).map { case (t, rows) => t -> rows.size.toLong }
    Retrieval.Queries.flatMap { case (q, terms) =>
      val scores = tf.filter(r => terms.contains(r._2))
        .groupBy(_._1)
        .map { case (id, rows) =>
          val dl = toks(id).size.toLong
          id -> rows.map { case (_, t, f) =>
            val idf = (2 * n - 2 * df(t) + 1) * 1000000L / (2 * df(t) + 1)
            val tfn = (22 * l * f * 1000000L) / (10 * l * f + 3 * l + 9 * dl * n)
            idf * tfn / 1000000L
          }.sum
        }
      scores.toSeq.sortBy { case (id, s) => (-s, id) }.take(Retrieval.BmK)
        .zipWithIndex.map { case ((id, s), i) => (q, (i + 1).toLong, id, s) }
    }
  }

  test("distributed bm25TopK equals the single-threaded integer oracle exactly") {
    val corpus = documents.select(col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val expected = reference(corpus)
    val got = Retrieval.bm25TopK(documents).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("a doc containing every query term outranks partial and diluted matches") {
    import spark.implicits._
    // q_id 3 = Seq("customer", "query"); doc 0 has both, doc 1 has one, doc 2 has
    // both but diluted by length (longer dl => smaller tf normalization)
    val docs = Seq(
      (0L, "customer query filler words here"),
      (1L, "customer filler words here only"),
      (2L, "customer query " + Seq.fill(60)("pad").mkString(" ")),
      (3L, "nothing relevant at all zzz")
    ).toDF("doc_id", "text")
    val got = Retrieval.bm25TopK(docs)
      .filter(col("q_id") === 3).collect()
      .map(r => (r.getLong(1), r.getLong(2))) // (rank, doc_id)
    assert(got.head === ((1L, 0L)), s"full short match must rank 1: ${got.toSeq}")
    assert(got.map(_._2).toSet === Set(0L, 1L, 2L), "doc 3 matches nothing")
    val byDoc = got.map { case (rk, id) => id -> rk }.toMap
    assert(byDoc(0L) < byDoc(2L), "length normalization must demote the diluted doc")
  }

  test("per-query top-k is the bounded aggregator, not a Window sort") {
    val plan = Retrieval.bm25TopK(documents).queryExecution.executedPlan.toString()
    assert(!plan.contains("row_number"), plan.take(2000))
    assert(plan.contains("ObjectHashAggregate"), plan.take(2000))
  }
}
