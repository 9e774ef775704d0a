package graft

import java.nio.file.Paths

import graft.operators.ExtractPipeline
import graft.sources.{Interleave, SnapshotSink, TableSnapshot}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Row-level UPSERT/MERGE ([[SnapshotSink.upsertDocs]]): matched documents' rows are
 * REPLACED (never appended beside the old rows), new documents are inserted,
 * untouched buckets stay byte-identical, a merge that crashes between waves is
 * healed by re-running it (idempotent re-merge), and stale derived-table rows
 * cascade-invalidate through [[TableSnapshot.deleteIds]] exactly like the takedown
 * cascade. Reference archetype: the language pack download's
 * replace-if-hash-differs idempotency (uiucprescon/ocr/languages.py:135-175).
 */
class SnapshotUpsertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"
  private val NB = 8

  private def tmpDir(tag: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-ups-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  private def docs: DataFrame = Interleave.docs(spark, sfDir)

  private def docIdsInBucket(out: String, b: Long, n: Int): Seq[String] =
    SnapshotSink.readBack(spark, out)
      .filter(col("bucket") === b).select(col("doc_id")).distinct()
      .orderBy(col("doc_id")).limit(n)
      .collect().map(_.getString(0)).toSeq

  /** One replacement row in the committed flat-span schema. */
  private def updateRows(ids: Seq[String]): DataFrame = {
    import spark.implicits._
    ids.map(id => (id, "en", 1, 0, "text", s"upd:$id",
        null: String, true, null: String, 0, 0.0))
      .toDF("doc_id", "lang", "n_doc_spans", "offset", "kind",
        "text", "media_ref", "ok", "error", "n_words", "conf_sum")
  }

  /** Logical content of the committed table, as a sorted in-memory multiset. */
  private def logicalRows(out: String): Seq[(String, Int, String, String)] =
    SnapshotSink.readCommitted(spark, out)
      .select(col("doc_id"), col("offset"), col("kind"),
        coalesce(col("text"), lit("")).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2), r.getString(3)))
      .toSeq.sorted

  // numeric suffix % 8 == 1; far outside the sf0.001 id space (0..499)
  private val InsertId = f"doc-${8000000000001L}%013d"

  test("merge replaces matched rows, inserts new docs, leaves other buckets byte-identical") {
    val out = tmpDir("merge")
    SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    val before = SnapshotSink.readManifest(spark, out).map(e => e.bucket -> e).toMap
    val rowsBefore = SnapshotSink.readBack(spark, out).count()

    val victims = docIdsInBucket(out, 2L, 2) ++ docIdsInBucket(out, 5L, 1)
    val victimRows = SnapshotSink.readBack(spark, out)
      .filter(col("doc_id").isInCollection(victims)).count()
    assert(victimRows > 3L, "victims should carry several spans each")

    val report = SnapshotSink.upsertDocs(spark, out,
      updateRows(victims :+ InsertId), NB)
    assert(report.rewrittenBuckets === Seq(1L, 2L, 5L))
    assert(report.matchedDocs === 3L)
    assert(report.insertedDocs === 1L)
    assert(report.replacedRows === victimRows)
    assert(report.upsertRows === 4L)

    val after = SnapshotSink.readManifest(spark, out).map(e => e.bucket -> e).toMap
    (0L until NB).filterNot(Seq(1L, 2L, 5L).contains).foreach { b =>
      assert(after(b) === before(b), s"bucket $b must be byte-identical")
    }
    Seq(1L, 2L, 5L).foreach { b =>
      assert(after(b).files !== before(b).files, s"bucket $b must be rewritten")
    }

    val back = SnapshotSink.readCommitted(spark, out)
    // REPLACE, not append: each victim now has exactly its one update row
    victims.foreach { id =>
      val rows = back.filter(col("doc_id") === id)
        .select(col("kind"), col("text")).collect()
      assert(rows.length === 1, s"victim $id must have exactly its new row set")
      assert(rows.head.getString(0) === "text" && rows.head.getString(1) === s"upd:$id")
    }
    assert(back.filter(col("doc_id") === InsertId).count() === 1L)
    assert(back.count() === rowsBefore - victimRows + 4L)
    // the merged snapshot still verifies end-to-end (resume = full no-op) —
    // note run()'s heal path would RE-EXTRACT from the source corpus; it must
    // not fire here because every bucket verifies
    val resume = SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    assert(resume.processed.isEmpty && resume.invalidated.isEmpty)
  }

  test("a crashed merge heals by re-running; result equals a never-crashed merge") {
    val outCrash = tmpDir("crash")
    val outCtl = tmpDir("ctl")
    Seq(outCrash, outCtl).foreach(o =>
      SnapshotSink.run(docs, o, nBuckets = NB, waveSize = NB))
    val victims = docIdsInBucket(outCtl, 0L, 1) ++ docIdsInBucket(outCtl, 3L, 1) ++
      docIdsInBucket(outCtl, 6L, 1)
    val updates = updateRows(victims :+ InsertId) // 4 buckets: 0, 1, 3, 6

    // crash after the FIRST single-bucket wave: one bucket merged, three pending
    intercept[SnapshotSink.InjectedCrash] {
      SnapshotSink.upsertDocs(spark, outCrash, updates, NB,
        waveSize = 1, crashAfterWaves = 1)
    }
    // mid-crash state is fully readable (each wave commit is atomic), merged so far
    val mid = SnapshotSink.readCommitted(spark, outCrash)
    assert(mid.filter(col("doc_id") === victims.head).count() === 1L,
      "wave 0's bucket must already be merged")
    assert(mid.filter(col("doc_id") === victims.last)
      .filter(col("kind") === "image").count() > 0L,
      "unmerged buckets must still hold the OLD rows")

    // heal = re-run the same merge; already-merged buckets re-merge idempotently
    val report = SnapshotSink.upsertDocs(spark, outCrash, updates, NB)
    assert(report.rewrittenBuckets === Seq(0L, 1L, 3L, 6L))
    SnapshotSink.upsertDocs(spark, outCtl, updates, NB)
    assert(logicalRows(outCrash) === logicalRows(outCtl),
      "crash+re-run must converge to the never-crashed result")
  }

  test("re-running the same merge is idempotent in content") {
    val out = tmpDir("idem")
    SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    val updates = updateRows(docIdsInBucket(out, 4L, 2))
    SnapshotSink.upsertDocs(spark, out, updates, NB)
    val once = logicalRows(out)
    val again = SnapshotSink.upsertDocs(spark, out, updates, NB)
    assert(again.matchedDocs === 2L && again.insertedDocs === 0L)
    assert(logicalRows(out) === once)
  }

  test("derived-table cascade: deleteIds removes touched ids' stale rows only") {
    val out = tmpDir("cascade")
    import spark.implicits._
    // a derived table keyed by numeric doc id (signature-table shape)
    val derived = (0L until 64L).map(i => (i, s"sig-$i")).toDF("doc_id", "sig")
    TableSnapshot.runHashBucketed(derived, "doc_id", out, NB)
    val touched = Seq(5L, 17L)
    val before = SnapshotSink.readManifest(spark, out).map(e => e.bucket -> e).toMap
    val report = TableSnapshot.deleteIds(spark, out, touched, "doc_id", NB)
    assert(report.deletedRows === 2L)
    val after = SnapshotSink.readManifest(spark, out).map(e => e.bucket -> e).toMap
    (0L until NB).filterNot(report.rewrittenBuckets.contains).foreach { b =>
      assert(after(b) === before(b), s"derived bucket $b must be byte-identical")
    }
    val back = TableSnapshot.readBack(spark, out)
    assert(back.filter(col("doc_id").isInCollection(touched)).count() === 0L)
    assert(back.count() === 62L)
  }

  test("null-id updates, schema drift, and non-canonical manifests are refused") {
    val out = tmpDir("refuse")
    SnapshotSink.run(docs, out, nBuckets = NB, waveSize = NB)
    val nullId = updateRows(Seq("doc-0000000000001"))
      .withColumn("doc_id", lit(null).cast("string"))
    val exNull = intercept[IllegalArgumentException] {
      SnapshotSink.upsertDocs(spark, out, nullId, NB)
    }
    assert(exNull.getMessage.contains("NULL doc_id"))

    val exSchema = intercept[IllegalArgumentException] {
      SnapshotSink.upsertDocs(spark, out,
        updateRows(Seq("doc-0000000000001")).drop("conf_sum"), NB)
    }
    assert(exSchema.getMessage.contains("schema"))

    val outStream = tmpDir("refuse-stream")
    val flat = ExtractPipeline.extractFlat(docs)
    SnapshotSink.commitStreamBatch(flat, outStream, batchId = 0L, NB)
    SnapshotSink.commitStreamBatch(flat.limit(0), outStream, batchId = 1L, NB)
    val exCanon = intercept[IllegalArgumentException] {
      SnapshotSink.upsertDocs(spark, outStream,
        updateRows(Seq("doc-0000000000001")), NB)
    }
    assert(exCanon.getMessage.contains("compact"))
  }
}
