package graft

import graft.operators.ExtractPipeline
import graft.sources.Interleave
import org.apache.spark.sql.SparkSession

/** Throwaway diagnostic: phase timings at two parallelism levels. */
object TuneBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val replicate = sys.env.getOrElse("SPARK_GRAFT_REPLICATE", "192").toInt
    Seq(8, 32).foreach { cpus =>
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val spark = SparkSession.builder().master(s"local[$cpus]")
        .appName(s"tune-$cpus")
        .config("spark.sql.shuffle.partitions", cpus.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4000000")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      def t(tag: String)(f: => Unit): Unit = {
        val times = (1 to 3).map { _ =>
          val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
        }
        println(f"TUNE cpus=$cpus $tag best=${times.min}%.2f all=${times.map(x => f"$x%.2f").mkString(",")}")
      }
      // full-size warmup: JIT the whole pipeline incl. codegen'd stages + agg
      ExtractPipeline.reassemble(
        ExtractPipeline.extractFlat(Interleave.materializedDocs(spark, sfDir, replicate)))
        .write.format("noop").mode("overwrite").save()
      t("noop_tiny") {
        spark.range(10).write.format("noop").mode("overwrite").save()
      }
      t("plan_only") {
        ExtractPipeline.reassemble(
          ExtractPipeline.extractFlat(Interleave.materializedDocs(spark, sfDir, replicate)))
          .queryExecution.executedPlan
      }
      t("scan_count") {
        Interleave.materializedDocs(spark, sfDir, replicate).count()
      }
      t("flat_narrow") {
        ExtractPipeline.extractFlat(Interleave.materializedDocs(spark, sfDir, replicate))
          .write.format("noop").mode("overwrite").save()
      }
      t("full_reassemble") {
        ExtractPipeline.reassemble(
          ExtractPipeline.extractFlat(Interleave.materializedDocs(spark, sfDir, replicate)))
          .write.format("noop").mode("overwrite").save()
      }
      t("full_sorted") {
        ExtractPipeline.reassembleSorted(
          ExtractPipeline.extractFlat(Interleave.materializedDocs(spark, sfDir, replicate)))
          .write.format("noop").mode("overwrite").save()
      }
      spark.stop()
    }
  }
}
