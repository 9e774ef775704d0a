package graft

import java.nio.file.Paths

import graft.operators.ExtractPipeline
import graft.sources.{Interleave, SnapshotSink}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Takedown deletes ([[SnapshotSink.deleteDocs]]): bucket-granular copy-on-write —
 * only the requested ids' buckets are rewritten, untouched buckets stay
 * byte-identical, deletion is physical (pre-delete versions referencing the
 * rewritten bucket expire loudly), and non-canonical manifests are refused.
 */
class DeleteDocsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val NB = 8

  private def tmpDir(tag: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-del-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  private def docs: DataFrame = Interleave.docs(spark, sfDir)

  private def docIdsInBucket(out: String, b: Long, n: Int): Seq[String] =
    SnapshotSink.readBack(spark, out)
      .filter(col("bucket") === b).select(col("doc_id")).distinct()
      .orderBy(col("doc_id")).limit(n)
      .collect().map(_.getString(0)).toSeq

  test("delete rewrites only the victims' buckets; other buckets stay byte-identical") {
    val out = tmpDir("cow")
    SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    val before = SnapshotSink.readManifest(spark, out).map(e => e.bucket -> e).toMap
    val rowsBefore = SnapshotSink.readBack(spark, out).count()

    val victims = docIdsInBucket(out, 2L, 2) ++ docIdsInBucket(out, 5L, 1)
    val victimRows = SnapshotSink.readBack(spark, out)
      .filter(col("doc_id").isInCollection(victims)).count()
    assert(victimRows > 0)

    val report = SnapshotSink.deleteDocs(spark, out, victims, NB)
    assert(report.rewrittenBuckets === Seq(2L, 5L))
    assert(report.deletedRows === victimRows)

    val after = SnapshotSink.readManifest(spark, out).map(e => e.bucket -> e).toMap
    // untouched buckets: identical file lists AND hashes; victims: new files
    (0L until NB).filterNot(Seq(2L, 5L).contains).foreach { b =>
      assert(after(b) === before(b), s"bucket $b must be byte-identical")
    }
    Seq(2L, 5L).foreach { b =>
      assert(after(b).files !== before(b).files, s"bucket $b must be rewritten")
      assert(after(b).rows < before(b).rows)
    }
    val back = SnapshotSink.readBack(spark, out)
    assert(back.count() === rowsBefore - victimRows)
    assert(back.filter(col("doc_id").isInCollection(victims)).count() === 0L)
    // the rewritten snapshot still verifies end-to-end (resume = full no-op)
    val resume = SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    assert(resume.processed.isEmpty && resume.invalidated.isEmpty)
  }

  test("deletion is physical: pre-delete versions expire loudly; absent ids are free") {
    val out = tmpDir("expire")
    SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    val v1 = SnapshotSink.versions(out).last

    // absent id: no rewrite, nothing deleted, manifest untouched
    val noop = SnapshotSink.deleteDocs(spark, out,
      Seq(f"doc-${9999999999999L}%013d"), NB)
    assert(noop === SnapshotSink.DeleteReport(0L, Seq.empty))
    assert(SnapshotSink.versions(out).last === v1)

    val victim = docIdsInBucket(out, 3L, 1)
    SnapshotSink.deleteDocs(spark, out, victim, NB)
    assert(SnapshotSink.versions(out).last === v1 + 1)
    // the pre-delete version referenced bucket 3's old files — now reclaimed
    val ex = intercept[IllegalArgumentException] {
      SnapshotSink.readCommittedAt(spark, out, v1).count()
    }
    assert(ex.getMessage.contains("EXPIRED"))
  }

  test("deleting every doc of a bucket leaves a legal empty bucket") {
    val out = tmpDir("empty")
    SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    val all = SnapshotSink.readBack(spark, out)
      .filter(col("bucket") === 6).select(col("doc_id")).distinct()
      .collect().map(_.getString(0)).toSeq
    val report = SnapshotSink.deleteDocs(spark, out, all, NB)
    assert(report.rewrittenBuckets === Seq(6L))
    val entry = SnapshotSink.readManifest(spark, out).find(_.bucket == 6L).get
    assert(entry.rows === 0L && entry.files.isEmpty)
    assert(SnapshotSink.readBack(spark, out).filter(col("bucket") === 6).count() === 0L)
  }

  test("non-canonical (multi-generation) manifests are refused") {
    val out = tmpDir("refuse")
    val flat = ExtractPipeline.extractFlat(docs)
    SnapshotSink.commitStreamBatch(flat, out, batchId = 0L, NB)
    SnapshotSink.commitStreamBatch(flat.limit(0), out, batchId = 1L, NB)
    val victim = f"doc-${0L}%013d"
    val ex = intercept[IllegalArgumentException] {
      SnapshotSink.deleteDocs(spark, out, Seq(victim), NB)
    }
    assert(ex.getMessage.contains("compact"))
  }
}
