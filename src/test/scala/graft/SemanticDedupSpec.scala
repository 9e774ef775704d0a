package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * SemDeDup-style semantic dedup ([[Similarity.semanticDedup]]) vs a plain-Scala
 * single-threaded oracle: IVF-cell assignment (exact integer squared-L2, (d2, cell)
 * tie-break), occupancy-capped within-cell cos pairs, union-find closure. Plus the
 * degenerate-cell guard: a 10³-copy identical-embedding family (re-crawled page /
 * default vector archetype) collapses onto ONE cell — the occupancy cap must drop
 * exactly that cell while leaving every normal group byte-identical.
 */
class SemanticDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** Mutant-widened quantized vectors, single-threaded (mirrors withEmbMutants+qvec). */
  private lazy val widened: Seq[(Long, Array[Long])] = {
    val raw = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    val mutants = raw.filter(_._1 % 10 == 0)
      .map { case (id, v) => (id + 100000L, v.map(x => x * 1.01 + 0.001)) }
    (raw ++ mutants).map { case (id, v) =>
      (id, v.map(x => math.floor(x * 1000).toLong))
    }
  }

  private def dot(a: Array[Long], b: Array[Long]): Long =
    a.zip(b).map { case (x, y) => x * y }.sum

  private def cosE6(a: Array[Long], b: Array[Long]): Long =
    math.floor((1000000.0 * dot(a, b)) /
      (math.sqrt(dot(a, a).toDouble) * math.sqrt(dot(b, b).toDouble))).toLong

  /** The whole operator, single-threaded: assignment, cap, pairs, union-find. */
  private def oracleGroups: Set[(Long, Long, Long, Int)] = {
    val cents = widened.filter(_._1 % Similarity.SemCentroidMod == 0)
      .map { case (id, q) => (id, q, dot(q, q)) }
    val cellOf: Map[Long, Long] = widened.map { case (id, q) =>
      val n2 = dot(q, q)
      id -> cents.map { case (cid, cq, cn2) => (n2 + cn2 - 2 * dot(q, cq), cid) }
        .min._2
    }.toMap
    val byCell = widened.groupBy(v => cellOf(v._1))
      .filter(_._2.size <= Dedup.MaxBucketOccupancy) // occupancy cap
    val pairs = byCell.values.toSeq.flatMap { members =>
      val m = members.sortBy(_._1)
      for {
        i <- m.indices; j <- (i + 1) until m.size
        if cosE6(m(i)._2, m(j)._2) >= Similarity.SemThresholdE6
      } yield (m(i)._1, m(j)._1)
    }
    // union-find closure
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val members = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val groups = members.groupBy(find)
    groups.flatMap { case (rep, ms) =>
      ms.map(v => (v, rep, ms.size.toLong, if (v == rep) 1 else 0))
    }.toSet
  }

  private def groupSet(df: DataFrame): Set[(Long, Long, Long, Int)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet

  test("semantic_dedup equals the single-threaded SemDeDup oracle") {
    val got = groupSet(Similarity.semanticDedup(Similarity.withEmbMutants(emb)))
    val expected = oracleGroups
    assert(got === expected)
    // not vacuous: the injected mutants produce real semantic groups
    assert(got.nonEmpty)
    // and the closure actually deduplicates: every group keeps exactly one canonical
    assert(got.groupBy(_._2).forall(_._2.count(_._4 == 1) == 1))
  }

  /** 10³ copies of one template vector, INCLUDING an id divisible by SemCentroidMod
    * so the family seeds its own cell (d2 = 0 for every copy; ties go to the lowest
    * such centroid). The template is a ±1 pattern with 8× the norm of the unit-ish
    * corpus vectors, so its centroid attracts NO normal vector (d2 >= |t|²+|v|²−2|t||v|
    * ≈ 49·10⁶ vs ≤ 4·10⁶ to any normal centroid) — normal assignments, and therefore
    * normal groups, are untouched by the injection. */
  private def identicalVectors: DataFrame = {
    val template = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0))
    spark.range(0, 1000)
      .select((lit(900000L) + col("id")).as("vec_id"), template.as("embedding"))
  }

  test("a 1000-copy identical-embedding family is capped out; normal groups unchanged") {
    val base = Similarity.withEmbMutants(emb)
    val injected = base.unionByName(identicalVectors)
    val withFam = groupSet(Similarity.semanticDedup(injected))
    // zero of the ~m²/2 intra-family pairs survive the occupancy cap
    assert(!withFam.exists(_._1 >= 900000L))
    assert(!withFam.exists(_._2 >= 900000L))
    // the normal population's groups are byte-identical to the uninjected run
    assert(withFam === groupSet(Similarity.semanticDedup(base)))
  }
}
