package graft.streaming

import graft.operators.Sessions
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}

/** One user's session record carried across micro-batches. `open=false` is the
  * TOMBSTONE left after a timeout close: it preserves the per-user session counter
  * so numbering stays identical to the batch operator across restarts (removing the
  * state entirely would restart idx at 1 when the user reappears). One fixed-size
  * record per user ever seen; a production deployment adds a TTL sweep for users
  * idle beyond retention. */
final case class SessionState(
    session_idx: Long,
    start_us: Long,
    last_us: Long,
    n_events: Long,
    types: Seq[String],
    open: Boolean)

/** A CLOSED session, same shape as the batch rollup
  * ([[graft.operators.Sessions.sessionize]]). */
final case class SessionOut(
    user_id: Long,
    session_idx: Long,
    n_events: Long,
    n_types: Long,
    start_us: Long,
    end_us: Long,
    dur_us: Long)

/** `event_ts` stays in the row: the watermark column must remain visible to the
  * stateful operator for EventTimeTimeout to be accepted by the planner. */
private[streaming] final case class SessEvent(
    user_id: Long, ts_us: Long, event_id: Long, event_type: String,
    event_ts: java.sql.Timestamp)

/**
 * Streaming gap-sessionization over the `events` stream — the
 * `KeyValueGroupedDataset.flatMapGroupsWithState` surface of the engine (the one
 * custom-state streaming shape the build rules call for; the windowed-agg shape is
 * [[StreamingExtract.windowedMetrics]]).
 *
 * Semantics = the batch operator's, incrementalized: a session CLOSES when a later
 * event of the same user arrives more than `gapMinutes` after it, or when the event
 * clock (watermark) passes `last_us + gap` (EventTimeTimeout) — so emitted rows are
 * exactly the batch rollup's rows, in append mode, with the per-user TRAILING session
 * still open in state. StreamingSessionsSpec asserts that equality against
 * [[graft.operators.Sessions.sessionize]] on the same drained input.
 *
 * Scale design: state per key is ONE record (open session summary) whose only
 * variable part is the distinct event-type set (bounded by the feed's type
 * cardinality — the exact-n_types contract the batch rollup also carries; an
 * unbounded-cardinality feed would swap it for an HLL count), never buffered
 * events — memory is O(active users), the watermark bounds state lifetime
 * via timeouts, and the only shuffle is the groupByKey exchange on user_id (same key,
 * same single shuffle as the batch window). Within a micro-batch the group's events
 * are sorted by (ts_us, event_id) before folding, so file-arrival order inside a
 * batch never changes the result.
 */
object StreamingSessions {

  def sessions(
      spark: SparkSession,
      tableDir: String,
      gapMinutes: Int = 30): Dataset[SessionOut] = {
    import spark.implicits._
    val raw = StreamSource.table(spark, tableDir)
    val gapUs = gapMinutes * 60L * 1000000L

    val events: Dataset[SessEvent] = raw
      .withColumn("event_ts", col("ts").cast("timestamp"))
      .withWatermark("event_ts", s"$gapMinutes minutes")
      .select(col("user_id"), unix_micros(col("event_ts")).as("ts_us"),
        col("event_id"), col("event_type"), col("event_ts"))
      .as[SessEvent]

    def fold(
        userId: Long,
        it: Iterator[SessEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      def close(s: SessionState): SessionOut =
        SessionOut(userId, s.session_idx, s.n_events, s.types.distinct.size.toLong,
          s.start_us, s.last_us, s.last_us - s.start_us)

      if (state.hasTimedOut) {
        // the watermark passed last_us + gap with no new events: close the session,
        // leave the counter-preserving tombstone (no new timeout registered)
        val out = state.getOption.filter(_.open).map(close).toSeq
        state.getOption.foreach(s => state.update(s.copy(open = false)))
        return out.iterator
      }
      // Drop watermark-late rows explicitly: flatMapGroupsWithState does NOT filter
      // them (unlike windowed aggs), and an arbitrarily-late event would otherwise
      // fabricate a fresh session on a tombstoned user or drag an open session's
      // clock around — diverging from the batch semantics the spec asserts
      // (ADVICE r2). getCurrentWatermarkMs() is 0 on the first batch (no filtering
      // before a watermark exists, matching the windowed-agg contract).
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val sorted = it.toVector.filter(_.ts_us >= wmUs).sortBy(e => (e.ts_us, e.event_id))
      val closed = Vector.newBuilder[SessionOut]
      var cur = state.getOption.orNull
      sorted.foreach { e =>
        cur match {
          case null =>
            cur = SessionState(1L, e.ts_us, e.ts_us, 1L, Seq(e.event_type), open = true)
          case s if !s.open =>
            cur = SessionState(s.session_idx + 1, e.ts_us, e.ts_us, 1L,
              Seq(e.event_type), open = true)
          case s if e.ts_us - s.last_us > gapUs =>
            closed += close(s)
            cur = SessionState(s.session_idx + 1, e.ts_us, e.ts_us, 1L,
              Seq(e.event_type), open = true)
          case s =>
            // clamp: an above-watermark event that still arrives out of order across
            // micro-batches must never move the session clock backwards (negative
            // durations) — extend the envelope instead (ADVICE r2). Append-if-absent
            // keeps the update O(|distinct types|) per event (a full .distinct
            // rebuild was quadratic per session); the set itself is bounded by the
            // feed's type cardinality — same bound the batch rollup's collect_set
            // carries — and a cardinality-unbounded feed would cap it (HLL count)
            // at the cost of exact n_types.
            cur = s.copy(start_us = math.min(s.start_us, e.ts_us),
              last_us = math.max(s.last_us, e.ts_us), n_events = s.n_events + 1,
              types = if (s.types.contains(e.event_type)) s.types
                else s.types :+ e.event_type)
        }
      }
      if (cur == null) return closed.result().iterator // every event was late; no state
      state.update(cur)
      // the open session times out (and closes) once the event clock passes its gap;
      // must stay strictly above the current watermark or Spark rejects it
      state.setTimeoutTimestamp(math.max(
        (cur.last_us + gapUs) / 1000L + 1L, state.getCurrentWatermarkMs() + 1L))
      closed.result().iterator
    }

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Drain the sessions stream once (AvailableNow) into a parquet sink — the
    * restartable form (the memory sink cannot recover a checkpoint): re-invocations
    * with the same checkpoint process only NEW files and append only NEW closed
    * sessions. */
  def drainOnceToParquet(
      spark: SparkSession,
      tableDir: String,
      outDir: String,
      checkpointDir: String,
      gapMinutes: Int = 30): Unit = {
    val q = sessions(spark, tableDir, gapMinutes).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain the sessions stream once (AvailableNow) into a named memory sink table,
    * returning the emitted (closed) sessions. */
  def drainOnce(
      spark: SparkSession,
      tableDir: String,
      checkpointDir: String,
      queryName: String,
      gapMinutes: Int = 30): DataFrame = {
    val q = sessions(spark, tableDir, gapMinutes).writeStream
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
