package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Range (interval) join ([[RangeJoin.rangeJoin]]): verified against a
 * single-threaded oracle on the sf events, proven invariant to the chunk
 * decomposition width (the knob is an implementation detail, never semantics),
 * and pinned on the [lo, hi) boundary semantics the DuckDB theta-join mirror
 * encodes.
 */
class RangeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  /** Single-threaded oracle over (event_id, user_id, ts_us, event_type) rows. */
  private def expected(rows: Seq[(Long, Long, Long, String)], windowUs: Long)
      : Seq[(Long, Long, Long, Long, Long, Long)] =
    rows.filter(_._4 == RangeJoin.IncidentType).map { inc =>
      val lo = inc._3
      val in = rows.filter(e => e._3 >= lo && e._3 < lo + windowUs)
      (inc._1, lo, in.size.toLong, in.map(_._2).distinct.size.toLong,
        in.map(_._4).distinct.size.toLong, in.map(_._3).max - lo)
    }.sortBy(_._1)

  test("range_join equals the single-threaded oracle on the sf events") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val got = RangeJoin.rangeJoin(events).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toSeq
    assert(got === expected(rows, RangeJoin.WindowUs))
    // non-vacuous: some window catches more than its own opening error
    assert(got.exists(_._3 > 1))
  }

  test("output is invariant to the chunk width (window, window/3+1, 7x window agree)") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val w = RangeJoin.WindowUs
    val runs = Seq(w, w / 3 + 1, 7 * w).map(c =>
      canon(RangeJoin.rangeJoin(events, chunkUs = c)))
    assert(runs.distinct.size === 1)
  }

  test("[lo, hi) boundaries: lo inclusive, hi exclusive, straddling a chunk edge") {
    import spark.implicits._
    val w = RangeJoin.WindowUs
    // place the incident so its window straddles a chunk boundary (lo just under a
    // multiple of the chunk width) — the decomposition's 2-chunk case
    val chunkEdge = 17L * w
    val lo = chunkEdge - 1000000L // 1s before the edge, in micros
    val frame = Seq(
      (100L, lo, 1L, RangeJoin.IncidentType), // opens the window; counted itself
      (101L, lo + w - 1, 2L, "view"),         // last micro inside -> counted
      (102L, lo + w, 3L, "view"),             // exactly hi -> excluded
      (103L, lo - 1, 4L, "view"),             // before lo -> excluded
      (104L, chunkEdge + 5, 5L, "click"))     // other side of the chunk edge -> counted
      .toDF("event_id", "us", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
    val got = RangeJoin.rangeJoin(frame).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
      r.getLong(5)) === ((100L, lo, 3L, 3L, 3L, w - 1)))
  }
}
