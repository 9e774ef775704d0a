package graft

import graft.operators.Sessions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Tumbling-window event rates ([[Sessions.eventRates]]): counts reconcile with
  * the raw events, windows are epoch-aligned 1-hour buckets, and every event is
  * covered by exactly the bucket its timestamp floors into. */
class EventRatesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  test("rates reconcile with the raw events and align to epoch hours") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val got = Sessions.eventRates(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.map(_._3).sum === events.count())
    val hourUs = 3600L * 1000000L
    assert(got.forall(_._1 % hourUs == 0), "window starts must be epoch-aligned")
    // single-threaded oracle: floor each event's ts into its hour bucket
    val expected = events
      .select(unix_micros(col("ts").cast("timestamp")), col("event_type"))
      .collect().map(r => (r.getLong(0) / hourUs * hourUs, r.getString(1)))
      .groupBy(identity).view.mapValues(_.size.toLong)
      .toSeq.map { case ((w, t), n) => (w, t, n) }.sortBy(t => (t._1, t._2))
    assert(got === expected)
  }
}
