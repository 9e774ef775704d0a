package graft

import java.nio.file.Paths

import graft.operators.TextAnalysis
import graft.sources.SnapshotSink
import graft.streaming.StreamingQuality
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming quality gate: the drained accepted set equals the batch classifier's
  * accepted set exactly — across a split arrival with a checkpointed restart, so
  * exactly-once (no loss on the first drain, no re-scoring on the second) is part
  * of the same assertion. */
class StreamingQualitySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-squal-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  test("streamed accepted rows == batch classifier accepted rows across a restart") {
    val table = tmp("table"); val out = tmp("out"); val ckpt = tmp("ckpt")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    docs.filter(col("doc_id") < 250).write.mode("append").parquet(table)
    StreamingQuality.drainAccepted(spark, table, out, ckpt)
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst > 0)

    docs.filter(col("doc_id") >= 250).write.mode("append").parquet(table)
    StreamingQuality.drainAccepted(spark, table, out, ckpt)

    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("doc_id"), col("lang"), col("n_feats"), col("score"), col("label"))
        .collect().map(_.mkString("|")).sorted.toSeq
    val streamed = canon(spark.read.parquet(out))
    val batch = canon(TextAnalysis.classifierScore(docs).filter(col("label") === 1))
    assert(streamed === batch) // no loss, no duplication, byte-equal scores
    assert(streamed.size > afterFirst.toInt)
    // the gate actually rejects something (otherwise this spec proves nothing)
    assert(streamed.size < docs.count())
  }
}
