package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * RANGE (interval) JOIN over the `events` table — every `error` event opens a
 * [[WindowUs]]-long incident window, and each window is joined to ALL events whose
 * timestamp falls inside it (blast-radius attribution: what happened in the 5
 * minutes after each error). The second time-series operator Spark lacks natively:
 * the naive SparkSQL form `JOIN ON e.ts BETWEEN i.lo AND i.hi` has no equi-key, so
 * Catalyst plans a BroadcastNestedLoopJoin — O(|events|·|incidents|) compares and
 * the exact plan shape this repo's PlanSpec gate forbids.
 *
 * Spark-first design: TIME-CHUNK DECOMPOSITION into an equi-join. Both sides key
 * on `chunk = ts_us div ChunkUs`; with the chunk width equal to the window length,
 * an interval overlaps at most TWO chunks, so each incident replicates into <= 2
 * chunk keys (a bounded `sequence` explode — never data-dependent fan-out) and the
 * join becomes `e.chunk = i.chunk AND lo <= e.ts < hi` — a shuffled hash/sort-merge
 * equi-join with a residual filter. The rollup then groups by incident.
 *
 * Scale: chunk-key cardinality grows linearly with the corpus timespan (a year of
 * micros / 5 min ≈ 10^5 keys) and per-chunk volume is the event rate × window — a
 * hot chunk (event storm) is ordinary AQE skew-join territory, not a plan defect.
 * Incident replication is a constant 2; nothing is broadcast (the incident side is
 * a fixed fraction of the corpus and grows with it). One shuffle per side plus the
 * final per-incident agg, whose key (incident) is a superset of nothing shared —
 * but the agg input is already the joined pairs, O(matches).
 *
 * The DuckDB oracle is the UNDECOMPOSED theta join (`ON e.ts_us >= lo AND
 * e.ts_us < hi`) — a genuinely independent formulation, so a chunking bug (missed
 * boundary, off-by-one on the covered-chunk range) cannot cancel out.
 *
 * Output: (incident_id, lo_us, n_events, n_users, n_types, span_us) per incident,
 * ordered by incident_id; every incident contains at least its own opening error.
 */
object RangeJoin {

  /** Incident window length: 5 minutes, in unix micros. */
  val WindowUs: Long = 5L * 60L * 1000000L

  /** Event type whose rows open incident windows. */
  val IncidentType = "error"

  private def tsUs = unix_micros(col("ts").cast("timestamp"))

  /**
   * The range join + per-incident rollup. `chunkUs` is the decomposition width —
   * an implementation knob proven output-invisible (RangeJoinSpec: widths where an
   * interval spans 2, 3, or many chunks all agree); the default (= window length)
   * minimizes replication at 2 chunk keys per incident.
   */
  def rangeJoin(events: DataFrame, windowUs: Long = WindowUs,
      chunkUs: Long = WindowUs): DataFrame = {
    val ev = events.select(col("event_id"), col("user_id"), tsUs.as("ts_us"),
      col("event_type"))
    val keyedEvents = ev.withColumn("chunk", floor(col("ts_us") / chunkUs))
    val incidents = ev.filter(col("event_type") === IncidentType)
      .select(col("event_id").as("incident_id"), col("ts_us").as("lo_us"),
        (col("ts_us") + windowUs).as("hi_us"))
      // chunks covered by [lo, hi): floor(lo/C) .. floor((hi-1)/C) — bounded
      // replication of ceil(window/chunk)+1 keys, independent of the data
      .withColumn("chunk",
        explode(sequence(floor(col("lo_us") / chunkUs),
          floor((col("hi_us") - 1) / chunkUs))))
    incidents.join(keyedEvents, Seq("chunk"))
      .filter(col("ts_us") >= col("lo_us") && col("ts_us") < col("hi_us"))
      .groupBy(col("incident_id"), col("lo_us"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        countDistinct(col("event_type")).as("n_types"),
        (max(col("ts_us")) - col("lo_us")).as("span_us"))
      .orderBy(col("incident_id"))
  }
}
