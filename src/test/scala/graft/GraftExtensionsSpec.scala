package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The session extension makes the native expressions SQL-callable: a session built
  * with spark.sql.extensions=graft.GraftExtensions resolves boilerplate_extract and
  * simhash64 in plain SQL, matching the Column-API results. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("native expressions resolve and evaluate from plain SQL") {
    // extensions attach at SESSION build time: clear the default so getOrCreate makes a
    // fresh SparkSession (reusing the JVM's SparkContext — do NOT stop it, other suites
    // share it) with the extensions applied
    SparkTestSession.spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // spark.sql.extensions is a STATIC conf read from the SparkContext at first
    // creation; for a context that already exists, builder.withExtensions is the
    // supported way to attach them to a new session (same extension class either way)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions().apply(_))
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT boilerplate_extract('<nav>m</nav><p>hello</p><a href="u">x</a>') AS c,
          |       boilerplate_extract('<ul><a href="u">all link</a></ul>') AS b,
          |       simhash64('hello world') AS h""".stripMargin).collect()(0)
      assert(r.getString(0) === "hello")
      assert(r.getString(1) === "") // link farm -> boilerplate -> empty, never null
      assert(r.getLong(2) === graft.functions.SimHashImpl.simhash64(
        org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
      val r2 = spark.sql(
        """SELECT dot_long(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d,
          |       size(minhash_bands('a b c d e')) AS nb,
          |       doc_fingerprint('a b c d e f').n_shingles AS ns""".stripMargin)
        .collect()(0)
      assert(r2.getLong(0) === 32L)
      assert(r2.getInt(1) === 4)
      assert(r2.getLong(2) === 2L)
      val r3 = spark.sql(
        """SELECT parse_hocr("<span class='ocrx_word' title='bbox 0 0 8 12; x_wconf 77'>w</span>")[0].word AS hw,
          |       parse_alto('<String CONTENT="v" HPOS="10" VPOS="0" WIDTH="8" HEIGHT="12" WC="60"/>')[0].hpos AS ah,
          |       parse_pdf('BT 1 0 0 1 5 9 Tm (p) Tj ET')[0].y AS py""".stripMargin)
        .collect()(0)
      assert(r3.getString(0) === "w")
      assert(r3.getInt(1) === 10)
      assert(r3.getInt(2) === 9)
      // window_hashes: 6 tokens -> 2 windows of 5; first = md5 of the 5-token span
      val r4 = spark.sql(
        """SELECT size(window_hashes('a b c d e f')) AS n,
          |       window_hashes('a b c d e f')[0] = md5('a b c d e') AS first_ok""".stripMargin)
        .collect()(0)
      assert(r4.getInt(0) === 2)
      assert(r4.getBoolean(1))
      val r5 = spark.sql("SELECT normalize_text('A  B\tC') AS n").collect()(0)
      assert(r5.getString(0) === "a b c")
    } finally {
      // leave the shared SparkContext running; just detach this session
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
