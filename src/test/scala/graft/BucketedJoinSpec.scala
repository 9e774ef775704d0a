package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins — the storage-layout half of the scale design: two tables
  * bucketed by the same key join WITHOUT any shuffle (no Exchange in the join subtree),
  * because each bucket pair is already co-partitioned on disk. At 100 TB this is the
  * difference between joining in place and moving both tables over the network. */
class BucketedJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("joining two tables bucketed on doc_id produces a shuffle-free plan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS graft_docs_a")
    spark.sql("DROP TABLE IF EXISTS graft_docs_b")
    // the in-memory catalog forgets tables between JVMs but their dirs persist
    Seq("graft_docs_a", "graft_docs_b").foreach { t =>
      graft.sources.SnapshotSink.deleteRecursively(
        java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft-test-warehouse", t))
    }
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_docs_a")
    docs.select(col("doc_id"), col("source"))
      .write.format("parquet").bucketBy(8, "doc_id").sortBy("doc_id")
      .saveAsTable("graft_docs_b")

    // the sample tables are tiny enough to broadcast, which would bypass the layout
    // being tested — force the shuffle-family join path
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = spark.table("graft_docs_a")
      .join(spark.table("graft_docs_b"), Seq("doc_id"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(joined.count() === docs.count())
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed join must not shuffle either side:\n$plan")
    assert(plan.contains("SelectedBucketsCount"), plan)

    // negative control: the same join over the UNBUCKETED source shuffles both sides
    val unbucketed = docs.select(col("doc_id"), col("lang"))
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .queryExecution.executedPlan.toString
    assert(unbucketed.contains("Exchange"), unbucketed)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_docs_a")
      spark.sql("DROP TABLE IF EXISTS graft_docs_b")
    }
  }
}
