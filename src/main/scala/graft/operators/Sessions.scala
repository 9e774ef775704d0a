package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Gap-based sessionization over the `events` table (event_id, ts, user_id, event_type,
 * value, props) — the window-function family of the training-data pipeline: a new
 * session starts when a user's inter-event gap exceeds `gapMinutes`.
 *
 * Determinism/oracle design: all time arithmetic runs on `unix_micros` BIGINTs
 * (DuckDB: `epoch_us`) — no float seconds, no timezone arithmetic — and the window
 * order (`ts, event_id`) is total, so lag/sum-over produce identical results on both
 * engines.
 *
 * Scale design: ONE shuffle on user_id serves both the windowed session assignment and
 * the per-session rollup (the groupBy keys are a superset of the window partition key,
 * so no second exchange is needed — verify with PlanAudit). Sessionization at web scale
 * is exactly this shape; skewed users (bots) would route through the same
 * count-threshold salting as document re-assembly.
 */
object Sessions {

  /** Per-event session assignment: adds session_idx (1-based per user). */
  def assign(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    // events.ts is TIMESTAMP_NTZ; the UTC session (engine-wide default) makes the
    // cast exact and matches DuckDB's epoch_us on the naive timestamp
    val us = unix_micros(col("ts").cast("timestamp"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_us", us)
      .withColumn("new_sess",
        when(lag(col("ts_us"), 1).over(w).isNull
          || col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess")).over(w))
  }

  /** Session-level rollup: (user_id, session_idx, n_events, n_types, start_us, end_us,
    * dur_us), totally ordered. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    assign(events, gapMinutes)
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"),
        (max(col("ts_us")) - min(col("ts_us"))).as("dur_us"))
      .orderBy(col("user_id"), col("session_idx"))
}
