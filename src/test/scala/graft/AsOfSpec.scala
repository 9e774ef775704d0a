package graft

import graft.operators.AsOf
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * As-of join ([[AsOf.asofJoin]]): verified against a single-threaded oracle on the
 * sf events table (left-join semantics non-vacuous in both directions), proven
 * byte-identical between the light single-window route and the chunked heavy-user
 * route on a mega-user, and pinned on the equal-timestamp inclusivity + max-id
 * tie-break the DuckDB mirror encodes.
 */
class AsOfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  /** Single-threaded oracle over (event_id, user_id, ts_us, event_type) rows. */
  private def expected(rows: Seq[(Long, Long, Long, String)])
      : Seq[(Long, Long, Long, Option[Long], Option[Long])] =
    rows.groupBy(_._2).toSeq.flatMap { case (user, evs) =>
      val rights = evs.filter(_._4 == AsOf.RightType)
        .map(e => (e._3, e._1)).sorted // (ts, id) ascending
      evs.filter(_._4 == AsOf.LeftType).map { l =>
        val m = rights.takeWhile(_._1 <= l._3).lastOption // inclusive; max (ts, id)
        (l._1, user, l._3, m.map(_._2), m.map(r => l._3 - r._1))
      }
    }.sortBy(_._1)

  private def gotTuples(df: DataFrame): Seq[(Long, Long, Long, Option[Long], Option[Long])] =
    df.collect().map { r =>
      (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))
    }.toSeq

  test("asof_join equals the single-threaded oracle on the sf events") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val rows = events.select(col("event_id"), col("user_id"),
      unix_micros(col("ts").cast("timestamp")), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq
    val got = gotTuples(AsOf.asofJoin(events))
    assert(got === expected(rows))
    // non-vacuous left-join semantics: both matched and unmatched left rows exist
    assert(got.exists(_._4.isEmpty) && got.exists(_._4.nonEmpty))
  }

  test("chunked heavy-user route is byte-identical to the light path") {
    // mega-user 9001: 200k events 1s apart alternating right/left, so every left
    // event matches the right event 1s before it; plus the real sf users (light)
    val mega = spark.range(0, 200000).select(
      (lit(1000000L) + col("id")).as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id")).cast("timestamp_ntz").as("ts"),
      lit(9001L).as("user_id"),
      when(pmod(col("id"), lit(2)) === 0, lit(AsOf.RightType))
        .otherwise(lit(AsOf.LeftType)).as("event_type"))
    val events = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .unionByName(mega)
    assert(AsOf.HeavyEventThreshold < 200000)
    val routed = AsOf.asofJoin(events) // default threshold: mega-user goes chunked
    val light = AsOf.asofJoin(events, heavyThreshold = Int.MaxValue)
    assert(canon(routed) === canon(light))
    // the mega-user's lefts all matched at gap exactly 1s
    val megaRows = routed.filter(col("user_id") === 9001L)
    assert(megaRows.count() === 100000L)
    assert(megaRows.filter(col("gap_us") =!= 1000000L).count() === 0L)
  }

  test("equal-timestamp rights match inclusively with the max-id tie-break, on both routes") {
    import spark.implicits._
    val t0 = 1700000000L
    val frame = Seq(
      // user 1: two rights at the SAME ts as the left -> left matches id 11 (max),
      // gap 0; an earlier left at t0-1 has no prior right -> NULL
      (5L, t0 - 1, 1L, AsOf.LeftType),
      (10L, t0, 1L, AsOf.RightType),
      (11L, t0, 1L, AsOf.RightType),
      (12L, t0, 1L, AsOf.LeftType),
      // user 2: right strictly after the left -> NULL (no look-ahead)
      (20L, t0, 2L, AsOf.LeftType),
      (21L, t0 + 1, 2L, AsOf.RightType))
      .toDF("event_id", "secs", "user_id", "event_type")
      .select(col("event_id"), timestamp_seconds(col("secs")).cast("timestamp_ntz").as("ts"),
        col("user_id"), col("event_type"))
    val exp = Seq(
      (5L, 1L, (t0 - 1) * 1000000L, None, None),
      (12L, 1L, t0 * 1000000L, Some(11L), Some(0L)),
      (20L, 2L, t0 * 1000000L, None, None))
    assert(gotTuples(AsOf.asofJoin(frame)) === exp)
    // heavyThreshold = 0 forces every user through the chunked route
    assert(gotTuples(AsOf.asofJoin(frame, heavyThreshold = 0)) === exp)
  }
}
