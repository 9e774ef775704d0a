package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * AS-OF JOIN over the `events` table — for each LEFT event, the most recent RIGHT
 * event of the same user at or before it (last-touch attribution: each `error`
 * joined to the click that preceded it). The canonical time-series operator Spark
 * has no native form for (Flink/DuckDB/Pandas all ship one; SparkSQL users fall
 * back to O(n·m) range joins or per-key collect_list UDFs).
 *
 * Spark-first design: NOT a join at all. Both sides are tagged and UNIONED, then a
 * single running `last(right_payload, ignoreNulls)` window over
 * (user, ORDER BY ts, side, id) hands every left row the latest right row at
 * ts' <= ts. One shuffle on user_id, no join, no range explosion — the plan shape
 * a sort-merge as-of join would have, expressed with stock operators so codegen
 * and AQE apply. Total order (ts_us, is_left, event_id): right rows sort BEFORE
 * left rows at an equal timestamp (inclusive match, DuckDB ASOF `>=` semantics)
 * and equal-timestamp right rows resolve to the max event_id — deterministic on
 * both engines.
 *
 * Scale design: the window partitions per user, so the same bot tail that skews
 * sessionize pins one task here (a 10^8-event user = one sort). Users above
 * [[HeavyEventThreshold]] route through [[matchChunked]]: stage 1 runs the same
 * running-last window per (user, TIME CHUNK) sized to ~[[TargetChunkRows]] rows
 * from the user's own stats; stage 2 computes each chunk's carry-in — the max
 * right (ts, id) struct over all PRECEDING chunks, a per-(user, chunk) summary
 * three orders of magnitude smaller than the events — and a bounded join back on
 * (user, chunk) lifts chunk-local misses to the global answer via
 * coalesce(local, carry). Byte-identical to the light path (AsOfSpec), chunk
 * count provably output-invisible.
 *
 * Output: (event_id, user_id, ts_us, matched_event_id, gap_us) — left-join
 * semantics (a left event with no prior right event keeps NULL matched/gap);
 * all BIGINT (unix micros), ordered by event_id. Reference tie-in: the engine's
 * events surface (SURVEY §2.10 sessionize family); determinism contract shared
 * with [[Sessions]] (unix_micros on TIMESTAMP_NTZ under the UTC session).
 */
object AsOf {

  /** Default sides: each `error` event attributed to the preceding `click`. */
  val LeftType = "error"
  val RightType = "click"

  /** Users with more events (both sides) than this take the chunked path —
    * same order of magnitude as [[Sessions.BotEventThreshold]]. */
  val HeavyEventThreshold = 100000

  /** Target rows per (user, chunk) window task on the chunked path. */
  val TargetChunkRows = 65536

  private def tsUs = unix_micros(col("ts").cast("timestamp"))

  /** Tag and union the two sides; the right side carries its (ts, id) as a struct
    * payload so one running `last` moves both fields consistently. */
  private def tagged(events: DataFrame, leftType: String, rightType: String) = {
    val ev = events.select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
      col("event_type"))
    val l = ev.filter(col("event_type") === leftType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        lit(1).as("is_left"),
        lit(null).cast("struct<r_ts:bigint,r_id:bigint>").as("r"))
    val r = ev.filter(col("event_type") === rightType)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        lit(0).as("is_left"),
        struct(col("ts_us").as("r_ts"), col("event_id").as("r_id")).as("r"))
    l.unionByName(r)
  }

  private def project(matched: DataFrame): DataFrame =
    matched.filter(col("is_left") === 1)
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("m.r_id").as("matched_event_id"),
        (col("ts_us") - col("m.r_ts")).as("gap_us"))

  /** Light path: one running-last window per user. */
  private[graft] def matchSimple(t: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    project(t.withColumn("m", last(col("r"), ignoreNulls = true).over(w)))
  }

  /**
   * Chunked path for heavy users. `stats` carries (user_id, __n, __lo, __hi) for
   * exactly the routed users (event count and unix-micros span over BOTH sides).
   * Chunk sizing is [[Sessions.assignChunked]]'s: per-user span targeting
   * ~[[TargetChunkRows]] rows/chunk, degenerate single-timestamp span guarded.
   * Note max over the summary structs is Spark's lexicographic struct ordering —
   * exactly the (r_ts, r_id) priority the window's ORDER BY establishes.
   */
  private[graft] def matchChunked(t: DataFrame, stats: DataFrame): DataFrame = {
    val sized = stats.select(col("user_id"),
      greatest(lit(1L),
        ceil((col("__hi") - col("__lo") + 1).cast("double")
          / ceil(col("__n").cast("double") / TargetChunkRows)).cast("long"))
        .as("__span"),
      col("__lo"))
    val e = t.join(broadcast(sized), Seq("user_id"))
      .withColumn("__chunk", floor((col("ts_us") - col("__lo")) / col("__span")))
    val wc = Window.partitionBy(col("user_id"), col("__chunk"))
      .orderBy(col("ts_us"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = e.withColumn("__m", last(col("r"), ignoreNulls = true).over(wc))
    // per-chunk summary: the latest right payload inside each chunk (null if none);
    // carry(k) = latest right payload over all chunks < k — max skips null chunks
    val ws = Window.partitionBy(col("user_id")).orderBy(col("__chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = local.groupBy(col("user_id"), col("__chunk"))
      .agg(max(col("r")).as("__cmax"))
      .withColumn("__carry", max(col("__cmax")).over(ws))
      .select(col("user_id"), col("__chunk"), col("__carry"))
    // join back on the chunk window's own partitioning keys (exchange reuse)
    val lifted = local.join(carries, Seq("user_id", "__chunk"))
      .withColumn("m", coalesce(col("__m"), col("__carry")))
    project(lifted)
  }

  /**
   * The as-of join: (event_id, user_id, ts_us, matched_event_id, gap_us), one row
   * per LEFT event, ordered by event_id. Users above `heavyThreshold` tagged
   * events route through the chunked path; each user lives in exactly one route,
   * so the unions are lossless and the light route keeps its single-shuffle plan.
   */
  def asofJoin(events: DataFrame, leftType: String = LeftType,
      rightType: String = RightType,
      heavyThreshold: Int = HeavyEventThreshold): DataFrame = {
    val t = tagged(events, leftType, rightType)
    val stats = t.select(col("user_id"), col("ts_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("__n"), min(col("ts_us")).as("__lo"),
        max(col("ts_us")).as("__hi"))
      .filter(col("__n") > heavyThreshold)
    val light = t.join(broadcast(stats.select(col("user_id"))),
      Seq("user_id"), "left_anti")
    val heavy = t.join(broadcast(stats.select(col("user_id"))),
      Seq("user_id"), "left_semi")
    matchSimple(light)
      .unionByName(matchChunked(heavy, stats))
      .orderBy(col("event_id"))
  }
}
