package graft

import graft.functions.PortableHash
import graft.operators.Similarity
import graft.sources.{SnapshotSink, TableSnapshot}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Incremental re-embedding consumer: after a two-wave embeddings commit, the
 * changes read between manifest versions 1 and 2 must surface exactly the second
 * wave's buckets AND physically scan ONLY those buckets' files — the O(changed)
 * contract (`reembed_incremental`'s scan-side half; the code values themselves are
 * DuckDB-gated).
 */
class ReembedSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("the changes read scans only the changed buckets' files") {
    val nb = Similarity.ReembedBuckets
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-reembed-spec")
    SnapshotSink.deleteRecursively(out)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val bucketCol = pmod(
      PortableHash.md5u32(concat(lit("rb:"), col("vec_id"))), lit(nb.toLong))
    TableSnapshot.run(emb.withColumn("bucket", bucketCol.cast("int")),
      out.toString, nb, waveSize = nb / 2)

    val changedB = SnapshotSink.changedBuckets(spark, out.toString, 1L, 2L)
    assert(changedB === (nb / 2 until nb).map(_.toLong),
      "the v1 -> v2 diff must be exactly the second wave's buckets")

    val entries = SnapshotSink.readManifest(spark, out.toString)
    val changedFiles = entries.filter(e => changedB.contains(e.bucket))
      .map(_.files.size).sum
    val totalFiles = entries.map(_.files.size).sum
    assert(changedFiles < totalFiles, "need unchanged files for the claim to bite")

    val df: DataFrame = SnapshotSink.readChangesBetween(spark, out.toString, 1L, 2L)
    df.collect()
    val scans = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scans.nonEmpty)
    val filesRead = scans.map(_.metrics("numFiles").value).sum
    assert(filesRead === changedFiles.toLong,
      s"changes read touched $filesRead files; changed buckets hold $changedFiles")

    // row parity: the diff is the second wave's rows, nothing more or less
    assert(df.count() === emb.filter(bucketCol >= nb / 2).count())
  }
}
