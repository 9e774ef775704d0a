package graft

import graft.operators.Capabilities
import graft.sources.Languages
import org.scalatest.funsuite.AnyFunSuite

/** Reference-API surface: LANGUAGE_CODES catalog shape, traineddata template, and the
  * capability parse — the ScalaTest forms of tests/test_basic.py:7-34 and
  * tests/feature/test_engine_feature.py:37-43. */
class ReferenceApiSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("LANGUAGE_CODES catalog: 117 codes incl. the osd/equ pseudo-languages") {
    assert(Languages.LanguageCodes.size === 117)
    assert(Languages.LanguageMap("eng") === "English")
    assert(Languages.LanguageMap("osd") === "Orientation and script detection module")
    assert(Languages.LanguageMap("equ") === "Math / equation detection module")
    assert(Languages.LanguageCodes.map(_._1).distinct.size === 117)
    assert(Languages.traineddataFile("eng") === "eng.traineddata")
    assert(Languages.dim(spark).count() === 117L)
  }

  test("capability parse: every segment parsed, version regex flags malformed shapes") {
    val rows = Capabilities.table(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(rows.map(_._1).sorted ===
      Seq("graft-synth", "jvm", "parquet", "spark", "tesseract-contract"))
    assert(rows.find(_._1 == "tesseract-contract").get._2 === "4.1.1")
    // the d.dd.dd regex (tests/test_basic.py:11-17): jvm "17.0" must FAIL it
    assert(rows.find(_._1 == "jvm").get._3 === 0)
    assert(rows.count(_._3 == 1) === 4)
  }
}
