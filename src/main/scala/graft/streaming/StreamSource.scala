package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.Trigger

/** The shared file-source bootstrap every streaming module uses — ONE copy of the
  * schema-infer + readStream pattern (and of the parquet AvailableNow drain), so a
  * change to source options or schema handling edits one place, not five. */
object StreamSource {

  /** Checkpointable file-source stream over a parquet table directory (schema
    * inferred from the current batch view — the standard file-stream bootstrap;
    * file-source offsets give exactly-once across restarts). */
  def table(spark: SparkSession, tableDir: String,
      maxFilesPerTrigger: Option[Int] = None): DataFrame = {
    val schema = spark.read.parquet(tableDir).schema
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.fold(reader)(m => reader.option("maxFilesPerTrigger", m.toString))
      .parquet(tableDir)
  }

  /** Drain the backlog once into a parquet sink (AvailableNow + checkpoint);
    * re-invocations with the same checkpoint process only new files. */
  def drainParquet(df: DataFrame, outDir: String, checkpointDir: String): Unit = {
    val q = df.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
