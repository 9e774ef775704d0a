package graft

import graft.operators.AsOf
import graft.sources.SnapshotSink
import graft.streaming.StreamingAsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The streaming as-of enrichment must agree with the batch operator
 * ([[AsOf.asofJoin]]) on the same drained input: every emitted match is a batch
 * row, and every batch row whose left event the watermark has definitely finalized
 * is emitted. The two-drain test proves checkpointed state carries the pending
 * buffer and the running last-right across restarts with exactly-once emission.
 */
class StreamingAsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"graft-sasof-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  private type M = (Long, Long, Long, Option[Long], Option[Long])

  private def rows(df: DataFrame): Set[M] =
    df.select(col("event_id"), col("user_id"), col("ts_us"),
        col("matched_event_id"), col("gap_us"))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))
      }.toSet

  private def batchRows(events: DataFrame): Set[M] = rows(AsOf.asofJoin(events))

  test("streamed matches == batch matches for watermark-finalized lefts") {
    val table = tmp("table"); val ckpt = tmp("ckpt")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    events.write.mode("overwrite").parquet(table)

    val emitted = rows(StreamingAsOf.drainOnce(spark, table, ckpt, "sasof_once"))
    val all = batchRows(events)
    val maxTs = events.agg(max(unix_micros(col("ts").cast("timestamp"))))
      .collect()(0).getLong(0)
    val finalized = all.filter(_._3 < maxTs - StreamingAsOf.DelayUs)

    assert(emitted.subsetOf(all), "streaming must not invent or mis-match")
    assert(finalized.subsetOf(emitted),
      "every watermark-finalized batch match must be emitted")
    assert(emitted.nonEmpty && finalized.nonEmpty)
  }

  test("restart: pending buffer and last-right survive the checkpoint, exactly once") {
    val table = tmp("rtable"); val ckpt = tmp("rckpt"); val out = tmp("rout")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val cut = events.agg(percentile_approx(unix_micros(col("ts").cast("timestamp")),
      lit(0.5), lit(100))).collect()(0).getLong(0)
    val half1 = events.filter(unix_micros(col("ts").cast("timestamp")) < cut)
    val half2 = events.filter(unix_micros(col("ts").cast("timestamp")) >= cut)
    assert(half1.count() > 0 && half2.count() > 0)

    half1.write.mode("append").parquet(table)
    StreamingAsOf.drainOnceToParquet(spark, table, out, ckpt)
    val e1 = rows(spark.read.parquet(out))

    half2.write.mode("append").parquet(table)
    StreamingAsOf.drainOnceToParquet(spark, table, out, ckpt)
    val emittedDf = spark.read.parquet(out)
    val emitted = rows(emittedDf)

    assert(emitted.size > e1.size, "second drain must finalize buffered lefts")
    // exactly-once: no left event emitted twice across the two drains
    assert(emittedDf.count() === emitted.size.toLong)

    val all = batchRows(events)
    val maxTs = events.agg(max(unix_micros(col("ts").cast("timestamp"))))
      .collect()(0).getLong(0)
    val finalized = all.filter(_._3 < maxTs - StreamingAsOf.DelayUs)
    assert(emitted.subsetOf(all))
    assert(finalized.subsetOf(emitted))
  }
}
