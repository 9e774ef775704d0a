package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Version / capability introspection, lifted from the reference's three entry points:
 * `tesseract_version` (uiucprescon/ocr/utils.cpp:4-6), `get_image_lib_versions`
 * (uiucprescon/ocr/Capabilities.cpp:7-10), and the Python-side parser
 * `image_lib_versions` (uiucprescon/ocr/capabilities.py:6-17) which splits the raw
 * `"name ver : name ver"` string on ':' then on ' '. The parse is pure Catalyst —
 * `str_to_map` after separator normalization — the reference's one genuine
 * string-processing function reproduced entirely with built-ins (SURVEY.md §2.7 F3).
 */
object Capabilities {

  /** Contract version: the engine reproduces tesseract 4.1.1 semantics
    * (reference conanfile.py:7). */
  val EngineVersion = "4.1.1"

  /** Raw capability string in the reference's `"name ver : name ver"` wire format.
    * `jvm 17.0` deliberately fails the version-shape regex (F5) — the checked surface
    * keeps a negative case alive. */
  val ImageLibVersions: String =
    "graft-synth 1.0.0 : parquet 1.15.2 : spark 4.1.2 : jvm 17.0"

  /** Version-shape predicate from the reference's tests
    * (tests/test_basic.py:11-17): d.dd?.dd? */
  val VersionRegex = "^[0-9][.][0-9]{1,2}[.][0-9]{1,2}$"

  /** Parsed capability table: (lib, version, version_ok) + the engine row. */
  def table(spark: SparkSession): DataFrame = {
    val parsed = spark.range(1)
      .select(explode(str_to_map(
        regexp_replace(lit(ImageLibVersions), " *: *", ":"), lit(":"), lit(" ")))
        .as(Seq("lib", "version")))
    val engineRow = spark.range(1)
      .select(lit("tesseract-contract").as("lib"), lit(EngineVersion).as("version"))
    parsed.unionByName(engineRow)
      .withColumn("version_ok",
        when(col("version").rlike(VersionRegex), 1).otherwise(0))
      .orderBy(col("lib"))
  }
}
