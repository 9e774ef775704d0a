package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Z-ORDER (Morton) layout key over the documents table — the multi-dimensional
 * file-clustering technique (Delta OPTIMIZE ZORDER, Iceberg sort-order z-curves)
 * that makes min/max file skipping work for MORE THAN ONE column at once: a linear
 * sort (lang, n_chars) prunes lang predicates perfectly and length predicates not
 * at all below 1/|langs| coverage, while a z-curve layout localizes BOTH
 * dimensions, so a range predicate on either one intersects only the files whose
 * z-range crosses it.
 *
 * The key is pure bit arithmetic — [[ZBits]] bits of each dimension interleaved
 * (dim-2 even positions, dim-1 odd) with a codegen'd Catalyst `aggregate` over a
 * constant 16-element sequence (no UDF) — and is exactly mirrored in DuckDB, so
 * the registered `zorder_key` query puts the bit math under the value-hash gate.
 * The LAYOUT claim itself (a files-written-by-z-range scan materializes fewer
 * rows under a second-dimension predicate than the linear layout) is executed-scan
 * metric evidence in ZOrderSpec, the same instrument as the committed-range-layout
 * proof (SnapshotResumeSpec).
 *
 * Dimension encoding: `lang` through the FIXED [[LangIndex]] dimension (unknown
 * langs to the tail index — deterministic, oracle-mirrored), `n_chars` clamped to
 * 16 bits. At 100 TB the same key feeds `repartitionByRange(zval)` in the snapshot
 * writer exactly as `(bucket, doc_id, offset)` does today — z-ordering is a sort
 * key choice, not new machinery.
 */
object Layout {

  /** Fixed language dimension of the synthetic corpus (interpolated into the
    * oracle; unknown langs map to [[LangIndex]].size). */
  val LangIndex: Seq[(String, Int)] =
    Seq("de" -> 0, "en" -> 1, "es" -> 2, "fr" -> 3, "zh" -> 4)

  /** Bits interleaved per dimension (16+16 -> a 32-bit significant z-value). */
  val ZBits = 16

  /** Generic Morton key over two LONG dimensions (dim1 odd bit positions, dim2
    * even — the same interleave as [[zorderKey]]'s SQL form, as a compositional
    * Column for OTHER tables): the layout key [[graft.sources.SnapshotSink.compact]]
    * range-partitions on when a caller asks for a z-ordered rewrite. Pure bit
    * arithmetic, codegen'd, no UDF. Callers clamp dimensions to [[ZBits]] bits. */
  def zval(dim1: Column, dim2: Column): Column =
    (0 until ZBits).foldLeft(lit(0L)) { (acc, i) =>
      acc + shiftleft(shiftright(dim1, i).bitwiseAND(lit(1L)), 2 * i + 1) +
        shiftleft(shiftright(dim2, i).bitwiseAND(lit(1L)), 2 * i)
    }

  /** The corpus language dimension as a LONG index column (unknown langs to the
    * tail index — the same encoding the zorder_key gate pins). */
  def langIdx(lang: Column): Column =
    coalesce(element_at(typedLit(LangIndex.toMap), lang), lit(LangIndex.size))
      .cast("long")

  /** Clamp a numeric dimension to the [[ZBits]]-bit range. */
  def clamp16(c: Column): Column = least(greatest(c.cast("long"), lit(0L)), lit(65535L))

  /** (doc_id, lang_idx, n_c, zval), ordered by doc_id. */
  def zorderKey(documents: DataFrame): DataFrame = {
    val idx = coalesce(element_at(typedLit(LangIndex.toMap), col("lang")),
      lit(LangIndex.size)).cast("long")
    documents
      .select(col("doc_id"), idx.as("lang_idx"),
        least(col("n_chars").cast("long"), lit(65535L)).as("n_c"))
      .withColumn("zval", expr(
        s"""aggregate(sequence(0, ${ZBits - 1}), CAST(0 AS BIGINT), (acc, i) ->
           |  acc + shiftleft(shiftright(lang_idx, i) & 1, 2*i+1)
           |      + shiftleft(shiftright(n_c, i) & 1, 2*i))""".stripMargin))
      .orderBy(col("doc_id"))
  }
}
