package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Streaming form of the quality-classifier filter — the shape of a production
 * ingestion gate: documents arrive as files, every row is scored by the hashed
 * linear model ([[TextAnalysis.classifierScored]] — per-row expressions only, so
 * the streaming plan IS the batch plan, stateless and append-legal), and rows
 * below the decision boundary are dropped before they ever reach the corpus
 * table. Exactly-once comes from the checkpointed file source, identical to
 * [[StreamingExtract]]; emitted rows are the batch operator's rows verbatim
 * (StreamingQualitySpec drains a split arrival and compares).
 *
 * LM scoring rides the batch side by design: the trigram-model join needs a
 * per-doc aggregation (illegal in un-watermarked append mode) — the production
 * split is exactly this one (cheap stateless filters on the stream; model-join
 * scoring in the batch/compaction pass over the committed table).
 */
object StreamingQuality {

  /** Streaming per-document classifier scores over a parquet table directory. */
  def stream(spark: SparkSession, tableDir: String): DataFrame =
    TextAnalysis.classifierScored(
      StreamSource.table(spark, tableDir, maxFilesPerTrigger = Some(16)))

  /** Drain the backlog once, keeping only rows the classifier accepts
    * (label = 1); re-invocations with the same checkpoint process only new files. */
  def drainAccepted(spark: SparkSession, tableDir: String, outDir: String,
      checkpointDir: String): Unit =
    StreamSource.drainParquet(
      stream(spark, tableDir).filter(col("label") === 1), outDir, checkpointDir)
}
