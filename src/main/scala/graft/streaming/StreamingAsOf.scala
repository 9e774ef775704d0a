package graft.streaming

import graft.operators.AsOf
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One buffered event awaiting finalization (its timestamp is still inside the
  * watermark horizon, so an earlier right event could still arrive). */
final case class AsOfPend(ts_us: Long, event_id: Long, is_left: Boolean)

/** Per-user as-of state: the pending buffer (bounded by the user's event rate x
  * watermark horizon — NOT stream lifetime) plus the latest finalized right event. */
final case class AsOfMatchState(
    pending: Seq[AsOfPend], r_ts: Long, r_id: Long, has_right: Boolean)

/** An emitted match, same shape as the batch operator's row
  * ([[graft.operators.AsOf.asofJoin]]); unmatched lefts carry None. */
final case class AsOfOut(event_id: Long, user_id: Long, ts_us: Long,
    matched_event_id: Option[Long], gap_us: Option[Long])

/** `event_ts` stays in the row: the watermark column must remain visible to the
  * stateful operator for EventTimeTimeout to be accepted by the planner. */
private[streaming] final case class AsOfEvent(
    user_id: Long, ts_us: Long, event_id: Long, is_left: Boolean,
    event_ts: java.sql.Timestamp)

/**
 * Streaming AS-OF enrichment over the `events` stream — the incremental form of
 * [[AsOf.asofJoin]] (each left event matched to the most recent right event of the
 * same user at or before it), via `flatMapGroupsWithState`.
 *
 * Why buffering is REQUIRED (unlike [[StreamingSessions]]' one-record state): the
 * as-of answer for a left event is only FINAL once no earlier-timestamped right
 * event can still arrive — i.e. once the watermark passes the left's timestamp. So
 * events buffer per user until the watermark finalizes them, then drain in the
 * batch operator's exact total order (ts, right-before-left, event_id): a right
 * event advances the running last-right; a left event emits with it (inclusive
 * equal-ts match, max-id tie-break — identical tuples to the batch output, which
 * StreamingAsOfSpec asserts). Late rows (below the watermark at arrival) are
 * dropped, the same documented divergence as the other stateful operators.
 *
 * Scale: state per user = the watermark-horizon buffer + one (ts, id) pair —
 * O(user rate x horizon) memory, never O(stream); emission is append-mode and
 * exactly-once across restarts through the checkpoint (two-drain spec). The only
 * shuffle is the groupByKey on user_id — the same single exchange as the batch
 * window. Timeouts re-drain the buffer as the watermark advances, so a user who
 * goes quiet still gets their finalized matches without waiting for a new event.
 */
object StreamingAsOf {

  /** Watermark horizon: how late a right event may arrive and still win. */
  val WatermarkDelay = "10 minutes"
  val DelayUs: Long = 10L * 60L * 1000000L

  def matches(
      spark: SparkSession,
      tableDir: String,
      leftType: String = AsOf.LeftType,
      rightType: String = AsOf.RightType): Dataset[AsOfOut] = {
    import spark.implicits._
    val raw = StreamSource.table(spark, tableDir)

    val events: Dataset[AsOfEvent] = raw
      .filter(col("event_type").isin(leftType, rightType))
      .withColumn("event_ts", col("ts").cast("timestamp"))
      .withWatermark("event_ts", WatermarkDelay)
      .select(col("user_id"), unix_micros(col("event_ts")).as("ts_us"),
        col("event_id"), (col("event_type") === leftType).as("is_left"),
        col("event_ts"))
      .as[AsOfEvent]

    def fold(
        userId: Long,
        it: Iterator[AsOfEvent],
        state: GroupState[AsOfMatchState]): Iterator[AsOfOut] = {
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(AsOfMatchState(Nil, 0L, 0L, false))
      // late-drop mirrors StreamingSessions (getCurrentWatermarkMs is 0 on the
      // first batch, so nothing drops before a watermark exists)
      val incoming =
        if (state.hasTimedOut) Vector.empty
        else it.filter(_.ts_us >= wmUs)
          .map(e => AsOfPend(e.ts_us, e.event_id, e.is_left)).toVector
      // the batch operator's total order: (ts, right-first, id) — right events at
      // an equal timestamp resolve before the left (inclusive match) and among
      // themselves ascending, so the LAST one seen is the max-id winner
      val all = (st.pending ++ incoming)
        .sortBy(p => (p.ts_us, p.is_left, p.event_id))
      val (ready, rest) = all.partition(_.ts_us < wmUs)
      var (rTs, rId, hasR) = (st.r_ts, st.r_id, st.has_right)
      val out = Vector.newBuilder[AsOfOut]
      ready.foreach { p =>
        if (!p.is_left) { rTs = p.ts_us; rId = p.event_id; hasR = true }
        else out += AsOfOut(p.event_id, userId, p.ts_us,
          if (hasR) Some(rId) else None, if (hasR) Some(p.ts_us - rTs) else None)
      }
      state.update(AsOfMatchState(rest, rTs, rId, hasR))
      // re-drain when the watermark passes the oldest pending event (strictly
      // above the current watermark or Spark rejects the timestamp)
      if (rest.nonEmpty)
        state.setTimeoutTimestamp(math.max(rest.map(_.ts_us).min / 1000L + 1L,
          state.getCurrentWatermarkMs() + 1L))
      out.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Drain once (AvailableNow) into a parquet sink — the restartable form:
    * re-invocations with the same checkpoint process only NEW files and append
    * only NEWLY finalized matches. */
  def drainOnceToParquet(
      spark: SparkSession,
      tableDir: String,
      outDir: String,
      checkpointDir: String): Unit = {
    val q = matches(spark, tableDir).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain once (AvailableNow) into a named memory sink, returning the matches. */
  def drainOnce(
      spark: SparkSession,
      tableDir: String,
      checkpointDir: String,
      queryName: String): DataFrame = {
    val q = matches(spark, tableDir).writeStream
      .format("memory")
      .queryName(queryName)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(queryName)
  }
}
