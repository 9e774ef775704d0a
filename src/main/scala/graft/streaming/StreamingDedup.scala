package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming EXACT DEDUP at ingestion — the exactly-once guard an at-least-once
 * crawl/event feed needs before anything downstream sees the rows. Built on
 * `dropDuplicatesWithinWatermark` over the natural key: state holds one entry per
 * key seen within the watermark horizon (NOT forever — the unbounded-state
 * `dropDuplicates` form is exactly what a 100-TB stream cannot run), so memory is
 * O(keys per horizon) and re-deliveries are suppressed in either of the only two
 * ways they can arrive:
 *
 *  - WITHIN the horizon: the key is in state, the duplicate row is dropped;
 *  - BEYOND the horizon (e.g. a replay after restart): the row is older than the
 *    watermark and is dropped as late before the stateful operator.
 *
 * Either way a key's row is emitted exactly once across drains and restarts
 * (checkpointed state; StreamingDedupSpec re-delivers across a restart and asserts
 * set-equality with the batch distinct). The horizon is the REPLAY BOUND the
 * deployment must honor: a duplicate arriving later than [[HorizonMinutes]] after
 * its original would be dropped anyway here (late), but pipelines whose sinks
 * accept late data must size the horizon to their redelivery SLA.
 */
object StreamingDedup {

  /** Dedup horizon: how far apart two copies of the same event may arrive (in
    * event time) and still be deduplicated by state rather than by lateness. */
  val HorizonMinutes = 30

  /** Deterministic at-least-once widening for tests/verification: every 7th event
    * is re-delivered VERBATIM (true redelivery — byte-identical row, same event
    * time), mirroring [[graft.operators.Dedup.withExactCopies]]'s role for batch. */
  def withRedelivery(events: DataFrame): DataFrame =
    events.unionByName(events.filter(col("event_id") % 7 === 0))

  /** The deduplicated stream over a parquet-backed events table. */
  def dedupped(spark: SparkSession, tableDir: String,
      horizonMinutes: Int = HorizonMinutes): DataFrame = {
    StreamSource.table(spark, tableDir)
      .withColumn("event_ts", col("ts").cast("timestamp"))
      .withWatermark("event_ts", s"$horizonMinutes minutes")
      .dropDuplicatesWithinWatermark("event_id")
      .drop("event_ts")
  }

  /** Drain once (AvailableNow) into a parquet sink — restartable: a re-invocation
    * with the same checkpoint processes only NEW files, and redelivered keys are
    * suppressed by checkpointed state (or lateness), never re-emitted. */
  def drainOnceToParquet(spark: SparkSession, tableDir: String, outDir: String,
      checkpointDir: String, horizonMinutes: Int = HorizonMinutes): Unit = {
    val q = dedupped(spark, tableDir, horizonMinutes).writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
