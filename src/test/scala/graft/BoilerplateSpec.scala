package graft

import graft.operators.TextClassifier
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Differential test: the single-pass codegen'd BoilerplateExtract expression must be
  * bit-identical to the declarative 3-regex formulation (which the DuckDB oracle mirrors
  * independently) on the full sf corpus markup AND on adversarial edge cases. */
class BoilerplateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val edges = Seq(
    "",
    "no tags at all",
    "<p>plain body</p>",
    "<p>a</p><p>b</p><p></p>",
    "<p>a<p>b</p>",                       // first <p> unterminated; inner one matches
    "<a href=\"u\">x</a>",                // pure link farm -> boilerplate
    "<a >x</a>",                          // '<a ' with empty attrs
    "<a>x</a>",                           // no space: NOT an anchor per the pattern
    "<a x>y</a",                          // unterminated </a
    "<ul><a href=\"u0\">all link</a><a href=\"u1\">nav</a></ul>",
    "<<>>",
    "<unclosed",
    "text < 5 > 3 more",                  // stray angle brackets form a 'tag'
    "<nav>m</nav><h1>t</h1><p>hello</p><a href=\"u\">more</a><footer>f</footer>",
    "<a x></a>",                          // empty anchor text
    "<p>x</p> trailing <a b>link text that is long</a>",
    "<a b>c</a><p>d</p>")

  test("native expression == declarative regexes on edge cases") {
    import spark.implicits._
    val df = edges.toDF("raw")
    val out = df.select(
      col("raw"),
      TextClassifier.classify(col("raw")).as("native"),
      TextClassifier.classifyDeclarative(col("raw")).as("declarative")).collect()
    out.foreach { r =>
      assert(r.getString(1) === r.getString(2), s"input: [${r.getString(0)}]")
    }
  }

  test("native expression == declarative regexes on every corpus text span") {
    val spans = graft.sources.Interleave.spansFlat(spark, "/root/testdata/sf0.001")
      .filter(col("kind") === "text")
    val mismatches = spans.select(
        TextClassifier.classify(col("text")).as("native"),
        TextClassifier.classifyDeclarative(col("text")).as("declarative"))
      .filter(not(col("native") <=> col("declarative")))
      .count()
    assert(mismatches === 0L)
  }

  test("fuzz: native == declarative on 2000 random tag-soup strings") {
    // adversarial alphabet: every char the scanner branches on
    val alphabet = "<>ap/ x\"='u".toCharArray
    val rnd = new scala.util.Random(20260817L)
    val soup = (1 to 2000).map { _ =>
      val n = rnd.nextInt(48)
      val sb = new StringBuilder
      (0 until n).foreach { _ =>
        // bias toward structural fragments so real tags appear often
        rnd.nextInt(6) match {
          case 0 => sb.append("<a ")
          case 1 => sb.append("</a>")
          case 2 => sb.append("<p>")
          case 3 => sb.append("</p>")
          case _ => sb.append(alphabet(rnd.nextInt(alphabet.length)))
        }
      }
      sb.toString
    }
    import spark.implicits._
    val mismatches = soup.toDF("raw").select(
        col("raw"),
        TextClassifier.classify(col("raw")).as("native"),
        TextClassifier.classifyDeclarative(col("raw")).as("declarative"))
      .filter(not(col("native") <=> col("declarative")))
      .collect()
    assert(mismatches.isEmpty,
      mismatches.take(5).map(r => s"[${r.getString(0)}] native=[${r.getString(1)}] decl=[${r.getString(2)}]").mkString("\n"))
  }

  test("expression participates in codegen (no fallback to interpreted projection)") {
    val plan = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(TextClassifier.classify(col("text")).as("c"))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project [boilerplate_extract"), plan)
  }
}
