package graft

import graft.operators.Layout
import graft.sources.SnapshotSink
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Z-order layout ([[Layout.zorderKey]]): the Morton key is pinned against a
 * single-threaded bit-interleave oracle, and the layout CLAIM — a z-clustered
 * file set prunes a second-dimension range predicate that a linear
 * (lang, length) sort cannot prune below whole-language coverage — is proven
 * from executed-scan metrics (numOutputRows after row-group skipping), the same
 * instrument as the committed-range-layout evidence.
 */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def tmp(tag: String): String = {
    val p = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), s"graft-zorder-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  test("zorder_key equals the single-threaded bit-interleave oracle") {
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    val idxOf = Layout.LangIndex.toMap
    val expected = documents.select(col("doc_id"), col("lang"), col("n_chars"))
      .collect().map { r =>
        val a = idxOf.getOrElse(r.getString(1), Layout.LangIndex.size).toLong
        val b = math.min(r.getLong(2), 65535L)
        val z = (0 until Layout.ZBits).map { i =>
          (((a >> i) & 1L) << (2 * i + 1)) + (((b >> i) & 1L) << (2 * i))
        }.sum
        (r.getLong(0), a, b, z)
      }.toSeq.sortBy(_._1)
    val got = Layout.zorderKey(documents).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    // the curve actually interleaves: z-values are not monotone in either dim alone
    assert(got.map(_._4).distinct.size > 1)
  }

  private def scannedRows(df: DataFrame): Long = {
    df.collect() // execute THIS plan so the scan metrics populate
    val scan = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).collect { case s: org.apache.spark.sql.execution.FileSourceScanExec => s }
    assert(scan.nonEmpty, "no FileSourceScanExec in executed plan")
    scan.map(_.metrics("numOutputRows").value).sum
  }

  test("z layout prunes a length predicate below the linear layout's coverage") {
    val documents = spark.read.parquet(s"$sfDir/documents.parquet")
    val keyed = Layout.zorderKey(documents)
    val dirL = tmp("linear"); val dirZ = tmp("z")
    // the realistic linear layout: files clustered by (lang, length)
    keyed.repartitionByRange(16, col("lang_idx"), col("n_c"))
      .sortWithinPartitions(col("lang_idx"), col("n_c"))
      .write.mode("overwrite").parquet(dirL)
    // the z layout: same 16 files, clustered along the curve
    keyed.repartitionByRange(16, col("zval"))
      .sortWithinPartitions(col("zval"))
      .write.mode("overwrite").parquet(dirZ)

    // a narrow second-dimension range (~10% of docs by length)
    val ncs = keyed.select(col("n_c")).collect().map(_.getLong(0)).sorted
    val (lo, hi) = (ncs((ncs.length * 0.45).toInt), ncs((ncs.length * 0.55).toInt))
    def q(dir: String): DataFrame = spark.read.parquet(dir)
      .filter(col("n_c") >= lo && col("n_c") < hi)

    // the predicate reaches both parquet scans
    Seq(dirL, dirZ).foreach { d =>
      val fmt = q(d).queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      assert(fmt.linesIterator.exists(l =>
        l.contains("PushedFilters") && l.contains("n_c")), fmt)
    }

    val total = keyed.count()
    val linRows = scannedRows(q(dirL))
    val zRows = scannedRows(q(dirZ))
    // linear layout: every language's middle-length files intersect the range;
    // z layout: only the z-ranges crossing those length bits do — strictly fewer
    // row groups survive the min/max skip
    assert(zRows < linRows,
      s"z layout scanned $zRows rows vs linear $linRows (total $total)")
    assert(zRows < total / 2, s"z layout scanned $zRows of $total rows")
    // ...and both layouts return exactly the same rows
    assert(q(dirZ).collect().map(_.getLong(0)).sorted
      === q(dirL).collect().map(_.getLong(0)).sorted)
  }
}
