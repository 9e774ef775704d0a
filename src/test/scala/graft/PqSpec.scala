package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Product quantization ([[Similarity.pqTrain]] / [[Similarity.pqEncode]]): the full
 * distributed training trajectory and the corpus encoding are compared against a
 * single-threaded Lloyd implementation (same exact-integer contract: quantize,
 * integer squared-L2, (d2, cell) tie-break, floor-of-double means), plus the
 * structural invariants an IVF-PQ deployment relies on.
 */
class PqSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val M = Similarity.PqSubspaces
  private val D = Similarity.PqSubDim

  /** (vec_id -> full 64-dim quantized vector), collected once. */
  private lazy val vecs: Map[Long, Array[Long]] = {
    spark.read.parquet(s"$sfDir/embeddings.parquet").collect().map { r =>
      val e = r.getSeq[Float](r.fieldIndex("embedding"))
      r.getLong(r.fieldIndex("vec_id")) ->
        e.map(x => math.floor(x.toDouble * 1000).toLong).toArray
    }.toMap
  }

  private def sq(id: Long, sub: Int): Array[Long] = vecs(id).slice(sub * D, sub * D + D)

  private def d2(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum

  /** argmin (d2, cell) of one subvector against the codebook's `s` slice. */
  private def nearest(cents: Map[(Int, Long), Array[Long]], id: Long, s: Int)
      : (Long, Long) = {
    val (dd, cell) = cents.collect { case ((cs, cell), cq) if cs == s =>
      (d2(sq(id, s), cq), cell) }.minBy(identity)
    (cell, dd)
  }

  /** Single-threaded Lloyd per subspace. Returns (final codebook, last TRAINING
    * assignment — the one that produced the final means, which is what n_members
    * counts, and final-codebook assignment — what pqEncode reports). */
  private def fit(initMod: Int, iters: Int): (Map[(Int, Long), Array[Long]],
      Map[(Long, Int), (Long, Long)], Map[(Long, Int), (Long, Long)]) = {
    var cents: Map[(Int, Long), Array[Long]] =
      (for (id <- vecs.keys if id % initMod == 0; s <- 0 until M)
        yield (s, id) -> sq(id, s)).toMap
    var asg = Map.empty[(Long, Int), (Long, Long)]
    for (_ <- 1 to iters) {
      asg = (for (id <- vecs.keys; s <- 0 until M)
        yield (id, s) -> nearest(cents, id, s)).toMap
      cents = asg.toSeq.groupBy { case ((_, s), (cell, _)) => (s, cell) }
        .map { case ((s, cell), ms) =>
          val ids = ms.map(_._1._1)
          val mean = (0 until D).map { d =>
            math.floor(ids.map(sq(_, s)(d)).sum.toDouble / ids.size).toLong
          }.toArray
          (s, cell) -> mean
        }
    }
    val finalAsg = (for (id <- vecs.keys; s <- 0 until M)
      yield (id, s) -> nearest(cents, id, s)).toMap
    (cents, asg, finalAsg)
  }

  private lazy val oracle = fit(Similarity.PqInitMod, Similarity.PqIters)

  test("pq_train equals the single-threaded Lloyd oracle") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (cents, trainAsg, _) = oracle
    val trainCounts = trainAsg.toSeq
      .groupBy { case ((_, s), (cell, _)) => (s, cell) }.view.mapValues(_.size).toMap
    val expected = cents.toSeq.flatMap { case ((s, cell), cq) =>
      cq.zipWithIndex.map { case (c, dim) =>
        (s.toLong, cell, dim.toLong, c, trainCounts((s, cell)).toLong) }
    }.sortBy(t => (t._1, t._2, t._3))
    val got = Similarity.pqTrain(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
    // non-degenerate: several codes per subspace, every subvector accounted for
    assert(cents.keys.count(_._1 == 0) >= 2)
    assert(trainCounts.values.sum === vecs.size * M)
  }

  test("pq_encode equals the oracle's final assignment; M codes per vector from the codebook") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (cents, _, finalAsg) = oracle
    val expected = finalAsg.toSeq
      .map { case ((id, s), (cell, dd)) => (id, s.toLong, cell, dd) }
      .sortBy(t => (t._1, t._2))
    val got = Similarity.pqEncode(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    val byVec = got.groupBy(_._1)
    assert(byVec.size === vecs.size)
    assert(byVec.values.forall(_.map(_._2).sorted == (0L until M.toLong)))
    val codebookCells = cents.keySet.map { case (s, cell) => (s.toLong, cell) }
    assert(got.forall(g => codebookCells.contains((g._2, g._3))))
  }

  test("pq_topk equals the single-threaded ADC oracle") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (cents, _, finalAsg) = oracle
    val queries = vecs.keys.filter(_ % Similarity.QueryMod == 0).toSeq
    assert(queries.size >= 2)
    val expected = queries.flatMap { q =>
      val adc = vecs.keys.filter(_ != q).map { v =>
        val dd = (0 until M).map { s =>
          d2(sq(q, s), cents((s, finalAsg((v, s))._1)))
        }.sum
        (v, dd)
      }.toSeq.sortBy { case (v, dd) => (dd, v) }
      adc.take(Similarity.DefaultK).zipWithIndex.map { case ((v, dd), i) =>
        (q, (i + 1).toLong, v, dd)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.pqTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("ivfpq_topk equals the composed single-threaded oracle (IVF probe + ADC)") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val (cents, _, finalAsg) = oracle
    // IVF coarse layer: exact-integer squared-L2 over the FULL vectors
    val icents = vecs.keys.filter(_ % Similarity.CentroidMod == 0)
      .map(c => c -> vecs(c)).toMap
    assert(icents.size >= 2)
    def fullD2(a: Array[Long], b: Array[Long]): Long = d2(a, b)
    def rankedCells(id: Long): Seq[Long] =
      icents.toSeq.map { case (c, cq) => (fullD2(vecs(id), cq), c) }
        .sorted.map(_._2)
    val cellOf = vecs.keys.map(id => id -> rankedCells(id).head).toMap
    val queries = vecs.keys.filter(_ % Similarity.QueryMod == 0).toSeq
    val expected = queries.flatMap { q =>
      val probed = rankedCells(q).take(Similarity.NprobeCells).toSet
      val adc = vecs.keys
        .filter(v => v != q && probed.contains(cellOf(v)))
        .map { v =>
          val dd = (0 until M).map { s =>
            d2(sq(q, s), cents((s, finalAsg((v, s))._1)))
          }.sum
          (v, dd)
        }.toSeq.sortBy { case (v, dd) => (dd, v) }
      adc.take(Similarity.DefaultK).zipWithIndex.map { case ((v, dd), i) =>
        (q, (i + 1).toLong, v, dd)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Similarity.ivfPqTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // the coarse layer genuinely restricts: ivfpq must not just reproduce pq_topk
    val unrestricted = Similarity.pqTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got !== unrestricted)
  }
}
