package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Degenerate-bucket occupancy cap (VERDICT r3 #1): an adversarial identical-content
 * population (template/boilerplate family, ~10³ documents) collapses onto ONE bucket
 * per band/block in every LSH scheme — m²/2 candidate pairs inside a single join key
 * that no partition-splitting can reduce. The cap must (a) keep candidate volume
 * near-linear by dropping exactly those buckets, and (b) leave every pair among the
 * NORMAL population untouched — the registered queries stay oracle-green because no
 * sf-scale bucket comes near [[Dedup.MaxBucketOccupancy]].
 */
class BucketCapSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private val FamilySize = 1000
  private val FamilyBase = 900000L

  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  /** `FamilySize` byte-identical documents — the blank-page/template archetype. */
  private def identicalDocs: DataFrame =
    spark.range(0, FamilySize)
      .select((lit(FamilyBase) + col("id")).as("doc_id"),
        lit("template boilerplate page with the same words every time").as("text"))

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col(df.columns(0)), col(df.columns(1))).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private def isInjected(p: (Long, Long)): Boolean =
    p._1 >= FamilyBase || p._2 >= FamilyBase

  test("minhash: 1000 identical docs are capped out; normal near-dup pairs unchanged") {
    val base = Dedup.withMutants(documents)
    val injected = base.unionByName(identicalDocs)

    // exactly the family's buckets exceed the cap: one (band, band_hash) per band
    val bands = Dedup.minhashBands(injected)
    val oversized = Dedup.oversizedBuckets(
      bands, Seq("band", "band_hash"), Dedup.MaxBucketOccupancy).collect()
    assert(oversized.length === 4) // NumPerms / BandWidth bands, all degenerate

    val withFam = pairSet(Dedup.neardupPairs(injected))
    // (a) near-linear volume: zero of the ~m²/2 = 499,500 intra-family pairs survive
    assert(!withFam.exists(isInjected))
    // (b) the normal population's pairs are byte-identical to the uninjected run
    assert(withFam === pairSet(Dedup.neardupPairs(base)))
  }

  test("simhash: identical docs share all 4 blocks; capped out, normal pairs unchanged") {
    val base = Dedup.withMutants(documents)
    val injected = base.unionByName(identicalDocs)

    val withFam = pairSet(Dedup.simhashPairs(injected))
    assert(!withFam.exists(isInjected))
    assert(withFam === pairSet(Dedup.simhashPairs(base)))
  }

  test("sign-LSH: 1000 identical embeddings capped out; normal pairs unchanged") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = Similarity.withEmbMutants(emb)
    val injected = base.unionByName(identicalVectors)

    val withFam = pairSet(Similarity.annLshPairs(injected))
    assert(!withFam.exists(isInjected))
    assert(withFam === pairSet(Similarity.annLshPairs(base)))
  }

  /** FamilySize copies of one SYNTHETIC template vector (a fixed ±1 pattern). A
    * synthetic direction, not a corpus vector: duplicating vector v would put v's
    * OWN buckets over the cap in every band — v's genuine mutant pair is then
    * (correctly, per the documented recall tradeoff) dropped, and the
    * normal-pairs-unchanged assertion would not hold. */
  private def identicalVectors: DataFrame = {
    val template = typedLit(Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0))
    spark.range(0, FamilySize)
      .select((lit(FamilyBase) + col("id")).as("vec_id"), template.as("embedding"))
  }
}
