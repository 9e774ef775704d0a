package graft

import graft.operators.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Bot-tail salting for sessionization (VERDICT r3 #2): one user with 10^6 events must
 * not pin a single window task. The salted route chunks the bot's timeline, windows
 * per (user, chunk), and lifts chunk-local session numbers to the global numbering —
 * the output must be BYTE-IDENTICAL to the unsalted single-window path.
 */
class SessionSaltSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val MegaEvents = 1000000L

  /** One mega-user ("bot") with 10^6 events 1s apart, a 1h hole every 100,000th
    * event (so sessions actually split), plus a handful of normal users exercising
    * the light path — all columns sessionize touches. */
  private def mixed: DataFrame = {
    val bot = spark.range(0, MegaEvents).select(
      concat(lit("e-bot-"), col("id")).as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id")
        + floor(col("id") / 100000).cast("long") * 3600).cast("timestamp_ntz").as("ts"),
      lit("bot-1").as("user_id"),
      concat(lit("t"), pmod(col("id"), lit(3))).as("event_type"))
    val humans = spark.range(0, 500).select(
      concat(lit("e-h-"), col("id")).as("event_id"),
      timestamp_seconds(lit(1700000000L) + col("id") * 2400)
        .cast("timestamp_ntz").as("ts"), // 40min apart -> every event its own session
      concat(lit("user-"), pmod(col("id"), lit(7))).as("user_id"),
      lit("ta").as("event_type"))
    bot.unionByName(humans)
  }

  private def canon(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).toSeq

  test("salted sessionize is byte-identical to the unsalted path for a 10^6-event bot") {
    val events = mixed
    // unsalted baseline: threshold above the bot's count -> everyone takes the
    // single-window path
    val unsalted = Sessions.sessionize(events, botThreshold = 2000000)
    // salted: the bot routes through the chunked path, humans stay light
    val salted = Sessions.sessionize(events)
    assert(Sessions.BotEventThreshold < MegaEvents)
    assert(canon(salted) === canon(unsalted))
    // sanity on the semantics: the bot has 10 sessions (one per 1h hole + the first)
    val botSessions = salted.filter(col("user_id") === "bot-1").count()
    assert(botSessions === 10)
  }

  test("the chunked route actually splits the bot across many window tasks") {
    val events = mixed
    val stats = events.filter(col("user_id") === "bot-1")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("__us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("__n"), min(col("__us")).as("__lo"),
        max(col("__us")).as("__hi"))
    val chunked = Sessions.assignChunked(
      events.filter(col("user_id") === "bot-1"), stats, gapMinutes = 30)
    val nChunks = chunked.select(col("__chunk")).distinct().count()
    // 10^6 events at ~TargetChunkRows=65536 per chunk -> >= 14 bounded tasks
    assert(nChunks >= 14, s"bot split into only $nChunks chunks")
    // every chunk is bounded by ~TargetChunkRows (the salt actually bounds skew)
    val maxChunk = chunked.groupBy(col("__chunk")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxChunk <= 2L * Sessions.TargetChunkRows,
      s"largest chunk holds $maxChunk events")
  }
}
