package graft

import graft.operators.Sessions
import graft.sources.SnapshotSink
import graft.streaming.StreamingSessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The flatMapGroupsWithState sessionizer must agree with the batch window-function
 * operator ([[graft.operators.Sessions.sessionize]]) on the same input: every CLOSED
 * session it emits is a batch-rollup row, and every batch row except (possibly) each
 * user's trailing still-open session is emitted. The two-drain test additionally
 * proves state survives a restart through the checkpoint: sessions left open by the
 * first drain close correctly when later events arrive in the second.
 */
class StreamingSessionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"graft-ssess-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  private type Sess = (Long, Long, Long, Long, Long, Long, Long)

  private def rows(df: DataFrame): Set[Sess] =
    df.select(col("user_id"), col("session_idx"), col("n_events"), col("n_types"),
        col("start_us"), col("end_us"), col("dur_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet

  /** batch rollup split into (all, trailing-open-session-per-user). */
  private def batchSplit(events: DataFrame): (Set[Sess], Set[Sess]) = {
    val all = rows(Sessions.sessionize(events))
    val tails = all.groupBy(_._1).map { case (_, ss) => ss.maxBy(_._2) }.toSet
    (all, tails)
  }

  test("closed streaming sessions == batch sessions (minus possibly-open tails)") {
    val table = tmp("table"); val ckpt = tmp("ckpt")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    events.write.mode("overwrite").parquet(table)

    val emitted = rows(StreamingSessions.drainOnce(spark, table, ckpt, "ssess_once"))
    val (all, tails) = batchSplit(events)

    assert((all -- tails).subsetOf(emitted),
      "every definitely-closed batch session must be emitted")
    assert(emitted.subsetOf(all), "streaming must not invent sessions")
    assert(emitted.nonEmpty)
  }

  test("restart: open sessions close across drains via checkpointed state") {
    val table = tmp("rtable"); val ckpt = tmp("rckpt"); val out = tmp("rout")
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val cut = events.agg(percentile_approx(unix_micros(col("ts").cast("timestamp")),
      lit(0.5), lit(100))).collect()(0).getLong(0)

    val half1 = events.filter(unix_micros(col("ts").cast("timestamp")) < cut)
    val half2 = events.filter(unix_micros(col("ts").cast("timestamp")) >= cut)
    assert(half1.count() > 0 && half2.count() > 0)

    half1.write.mode("append").parquet(table)
    StreamingSessions.drainOnceToParquet(spark, table, out, ckpt)
    val e1 = rows(spark.read.parquet(out))

    half2.write.mode("append").parquet(table)
    StreamingSessions.drainOnceToParquet(spark, table, out, ckpt)

    val (all, tails) = batchSplit(events)
    val emitted = rows(spark.read.parquet(out))
    assert(emitted.size > e1.size, "second drain must close sessions left open")
    val missing = (all -- tails) -- emitted
    val invented = emitted -- all
    assert(missing.isEmpty,
      s"missing ${missing.size}: ${missing.take(3)}; invented ${invented.size}: ${invented.take(3)}")
    assert(emitted.subsetOf(all), s"invented: ${invented.take(5)}")
  }
}
