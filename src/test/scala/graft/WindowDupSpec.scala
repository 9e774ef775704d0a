package graft

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Substring-window exact-match dedup ([[Dedup.windowDup]]). Semantic claims:
 * (1) containment is the right score for copy-paste duplication — a short document
 * verbatim-embedded in a longer one scores 1.0 here while staying BELOW the MinHash
 * pipeline's Jaccard threshold (the modality this operator adds); (2) mutants (which
 * contain every window of their original) pair at full containment; (3) the
 * degenerate-bucket occupancy cap bounds an adversarial identical-content family to
 * zero emitted pairs without touching the normal population (same contract as the
 * LSH caps, BucketCapSpec).
 */
class WindowDupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private lazy val documents = spark.read.parquet(s"$sfDir/documents.parquet")

  private def pairs(df: DataFrame): Map[(Long, Long), Long] =
    df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(3))).toMap

  test("mutants pair with their originals at containment 1.0") {
    val got = pairs(Dedup.windowDup(Dedup.withMutants(documents)))
    // full containment needs >= 5 tokens: a shorter doc's single end-clamped
    // window differs from its mutant's (which starts with 'mutant'), so such a
    // pair is correctly ABSENT on both engines — keep the assertion off it
    val mutantIds = documents
      .filter(col("doc_id") % 10 === 0 && size(split(col("text"), " ")) >= 5)
      .select(col("doc_id")).collect().map(_.getLong(0))
    assert(mutantIds.nonEmpty)
    mutantIds.foreach { d =>
      assert(got.get((d, d + 100000)).contains(1000000L),
        s"mutant pair ($d, ${d + 100000}) missing or below full containment")
    }
    // ordering invariant: doc_a < doc_b everywhere
    assert(got.keys.forall(p => p._1 < p._2))
  }

  test("verbatim-embedded short doc: full window containment, below Jaccard 0.5") {
    // build a 12-token prefix of a real corpus doc as a new document — the
    // copy-paste-into-a-longer-page shape that whole-doc hashing and Jaccard miss
    val (srcId, srcText) = {
      val r = documents.orderBy(col("doc_id")).select(col("doc_id"), col("text"))
        .filter(size(split(col("text"), " ")) >= lit(24)).head()
      (r.getLong(0), r.getString(1))
    }
    val shortText = srcText.split(" ", -1).take(12).mkString(" ")
    import spark.implicits._
    val injected = documents.select(col("doc_id"), col("text"))
      .unionByName(Seq((700000L, shortText)).toDF("doc_id", "text"))

    val wd = pairs(Dedup.windowDup(injected))
    assert(wd.get((srcId, 700000L)).contains(1000000L),
      "embedded prefix must reach full containment against its source")

    // the SAME pair is invisible to the MinHash near-dup pipeline: 12 of >=24
    // tokens gives Jaccard well under the 0.5 threshold
    val nd = Dedup.neardupPairs(injected)
      .filter(col("doc_a") === srcId && col("doc_b") === 700000L).count()
    assert(nd === 0L, "Jaccard pipeline should NOT pair a small embedded fragment")
  }

  test("committed window-hash path == session path; rerun resumes from the manifest") {
    val dir = java.nio.file.Files.createTempDirectory("graft-winhash-spec").toString
    try {
      val docs = Dedup.withMutants(documents)
      val session = Dedup.windowDup(docs).collect().toSeq
      val committed = Dedup.windowDupCommitted(docs, dir).collect().toSeq
      assert(committed === session)
      // second run resumes: verified buckets read back from parquet, same result
      assert(Dedup.windowDupCommitted(docs, dir).collect().toSeq === session)
    } finally {
      graft.sources.SnapshotSink.deleteRecursively(java.nio.file.Paths.get(dir))
    }
  }

  test("1000 identical docs are capped out; normal pairs unchanged") {
    val base = Dedup.withMutants(documents)
    val fam = spark.range(0, 1000)
      .select((lit(900000L) + col("id")).as("doc_id"),
        lit("template boilerplate page with the same words every time").as("text"))
    val injected = base.unionByName(fam)

    // every window of the family exceeds the cap: 9 tokens -> 5 windows, each at
    // occupancy 1000
    val oversized = Dedup.oversizedBuckets(
      Dedup.windowHashes(fam), Seq("whash"), Dedup.MaxBucketOccupancy).count()
    assert(oversized === 5L)

    val withFam = pairs(Dedup.windowDup(injected))
    assert(!withFam.keys.exists(p => p._1 >= 900000L || p._2 >= 900000L),
      "no intra-family pair may survive the occupancy cap")
    assert(withFam === pairs(Dedup.windowDup(base)),
      "normal population's pairs must be byte-identical to the uninjected run")
  }
}
