package graft

import graft.sources.SnapshotSink
import graft.streaming.StreamingDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Exactly-once ingestion dedup: an at-least-once feed (every 7th event redelivered
 * verbatim, including ACROSS a restart) must come out with each event exactly once —
 * set-equal to the batch distinct — with duplicate suppression surviving the
 * checkpoint. Events are the natural-key stream (event_id unique in the fixture).
 */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"graft-sdedup-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  private def keys(df: DataFrame): Seq[Long] =
    df.select(col("event_id")).collect().map(_.getLong(0)).toSeq

  test("redelivered events across a restart are emitted exactly once") {
    val table = tmp("table"); val ckpt = tmp("ckpt"); val out = tmp("out")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    assert(keys(events).distinct.size === events.count(), "fixture key uniqueness")

    val cut = events.agg(percentile_approx(unix_micros(col("ts").cast("timestamp")),
      lit(0.5), lit(100))).head.getLong(0)
    val half1 = events.filter(unix_micros(col("ts").cast("timestamp")) < cut)
    val half2 = events.filter(unix_micros(col("ts").cast("timestamp")) >= cut)

    // drain 1: first half, at-least-once
    StreamingDedup.withRedelivery(half1).write.mode("append").parquet(table)
    StreamingDedup.drainOnceToParquet(spark, table, out, ckpt)
    val e1 = keys(spark.read.parquet(out))
    assert(e1.distinct.size === e1.size, "no duplicates after drain 1")
    assert(e1.toSet === keys(half1).toSet)

    // drain 2: second half at-least-once PLUS a replay of drain 1's duplicates
    // (restart-style redelivery: same rows, new files)
    StreamingDedup.withRedelivery(half2)
      .unionByName(half1.filter(col("event_id") % 7 === 0))
      .write.mode("append").parquet(table)
    StreamingDedup.drainOnceToParquet(spark, table, out, ckpt)

    val all = keys(spark.read.parquet(out))
    assert(all.distinct.size === all.size,
      "a redelivered key must never be emitted twice, even across the restart")
    assert(all.toSet === keys(events).toSet, "every event exactly once")
  }
}
