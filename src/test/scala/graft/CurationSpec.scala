package graft

import graft.operators.Curation
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Curation operators: deterministic stratified sampling + the quality funnel. */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("thresholdHex: 8 lowercase hex digits, monotone in the rate, saturates at 1.0") {
    assert(Curation.thresholdHex(0.0) === "00000000")
    assert(Curation.thresholdHex(0.5) === "80000000")
    assert(Curation.thresholdHex(1.0) === "ffffffff") // floor(2^32) clamped to u32 max
    val rates = Seq(0.01, 0.1, 0.25, 0.5, 0.9, 0.999)
    assert(rates.map(Curation.thresholdHex) === rates.map(Curation.thresholdHex).sorted)
    rates.foreach(r => assert(Curation.thresholdHex(r).matches("[0-9a-f]{8}")))
  }

  test("sampling is deterministic: two runs select byte-identical membership") {
    val a = Curation.sampleStratified(docs).collect().toSeq
    val b = Curation.sampleStratified(docs).collect().toSeq
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("per-stratum keep counts sit inside 4-sigma binomial bounds; rate-1.0 is exact") {
    val byLang = docs.groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = Curation.sampleStratified(docs)
      .groupBy($"lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Curation.MixRates.foreach { case (lang, rate) =>
      val n = byLang(lang)
      val k = kept.getOrElse(lang, 0L).toDouble
      if (rate >= 1.0) assert(k === n.toDouble, s"rate-1.0 stratum $lang must keep all")
      else {
        val sigma = math.sqrt(n * rate * (1 - rate))
        assert(math.abs(k - n * rate) <= 4 * sigma + 1,
          s"stratum $lang: kept $k of $n at rate $rate (expected ~${n * rate})")
      }
    }
  }

  test("a salt bump re-rolls membership (draws are independent across versions)") {
    // same rule, different salt, computed inline — the operator's key must not be
    // reproducible from a stale salt
    val altKey = substring(
      md5(concat_ws(":", lit(Curation.MixSalt + "-alt"), $"doc_id".cast("string"))), 1, 8)
    val alt = docs
      .select($"doc_id", $"lang", altKey.as("k"))
      .filter($"lang" === "en" && $"k" < lit(Curation.thresholdHex(0.5)))
      .select($"doc_id").as[Long].collect().toSet
    val cur = Curation.sampleStratified(docs)
      .filter($"lang" === "en")
      .select($"doc_id").as[Long].collect().toSet
    assert(alt !== cur, "independent draws coinciding exactly is astronomically unlikely")
    // ... but at the same 0.5 rate both should be plausible samples
    assert(math.abs(alt.size - cur.size) < cur.size)
  }

  test("sampler plan is a shuffle-free scan (pure filter, no Exchange)") {
    // the registered query's trailing orderBy plans one range exchange for OUTPUT
    // ordering (driver-compare requirement, not part of the operator); the sampling
    // rule itself — the same key/threshold filter without the presentation sort —
    // must plan as a pure scan+filter
    val filterOnly = docs
      .select($"doc_id", $"lang")
      .filter(substring(md5(concat_ws(":", lit(Curation.MixSalt),
        $"doc_id".cast("string"))), 1, 8) < lit(Curation.thresholdHex(0.5)))
      .queryExecution.executedPlan
    assert(filterOnly.collect { case e: Exchange => e }.isEmpty)
  }

  test("sampler scan prunes to (doc_id, lang) — never reads text bytes") {
    // at 100 TB the text column IS the table; a mixing pass that keys on doc_id
    // must not drag it through the scan
    val plan = Curation.sampleStratified(docs).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val scans = plan.linesIterator.filter(_.contains("ReadSchema")).toSeq
    assert(scans.nonEmpty)
    assert(scans.forall(s => s.contains("doc_id") && !s.contains("text")),
      s"sampler scan must read only (doc_id, lang): $scans")
  }

  test("funnel stages partition the corpus; every label is a declared stage") {
    val verdicts = Curation.qualityFilter(docs)
    assert(verdicts.count() === docs.count())
    val labels = verdicts.select($"stage").distinct().as[String].collect().toSet
    assert(labels.subsetOf(Curation.FunnelStages.toSet))
    val funnel = Curation.qualityFunnel(docs).collect()
    assert(funnel.map(_.getString(1)).toSeq === Curation.FunnelStages)
    assert(funnel.map(_.getLong(2)).sum === docs.count())
    // kept flag agrees with the pass label
    val mismatched = verdicts.filter(
      ($"stage" === "pass" && $"kept" =!= 1) || ($"stage" =!= "pass" && $"kept" =!= 0))
    assert(mismatched.isEmpty)
  }

  test("corpus stats: cells cover the corpus exactly; extremes bound the totals") {
    val stats = Curation.corpusStats(docs).collect()
    assert(stats.map(_.getAs[Long]("n_docs")).sum === docs.count())
    // share_e6 sums to ~1e6 (floor per cell loses < 1 per cell)
    val share = stats.map(_.getAs[Long]("share_e6")).sum
    assert(share > 1000000L - stats.length && share <= 1000000L)
    stats.foreach { r =>
      val (lo, hi, tok, n) = (r.getAs[Long]("min_tokens"), r.getAs[Long]("max_tokens"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_docs"))
      assert(lo <= hi && tok >= lo * n && tok <= hi * n)
    }
  }

  test("funnel is non-degenerate on the synthetic corpus: pass and at least one reject") {
    val counts = Curation.qualityFunnel(docs).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(counts("pass") > 0, "thresholds reject the whole corpus — retune")
    assert(counts.filterNot(_._1 == "pass").values.sum > 0,
      "thresholds reject nothing — the funnel is vacuous")
  }

  test("budget-mix keep stage is a shuffle-free scan (no Exchange before the sort)") {
    // the rates are a driver literal by the time the filter plans, so the keep
    // stage must be scan+filter exactly like the open-loop sampler; only the
    // trailing presentation orderBy may exchange. Count exchanges in the full
    // registered plan: exactly the one range exchange from the sort.
    val exchanges = Curation.tokenBudgetMix(docs)
      .queryExecution.executedPlan.collect { case e: Exchange => e }
    assert(exchanges.size <= 1,
      s"keep stage must not shuffle; found ${exchanges.size} exchanges")
  }

  test("token-budget mix: deterministic, budget-respecting, stats reconcile") {
    val mix1 = Curation.tokenBudgetMix(docs).collect()
    val mix2 = Curation.tokenBudgetMix(docs).collect()
    assert(mix1.map(_.toString).toSeq === mix2.map(_.toString).toSeq,
      "membership must be byte-identical across runs")

    val stats = Curation.tokenBudgetStats(docs).collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // every corpus lang appears in the report
    val langs = docs.select(col("lang")).distinct().as[String].collect().toSet
    assert(stats.keySet === langs)

    stats.foreach { case (lang, (total, budget, rateE6, nKept, keptTokens)) =>
      if (total <= budget) {
        // under-budget lang kept whole
        assert(rateE6 === 1000000L && keptTokens === total, lang)
      } else if (budget == 0L) {
        assert(nKept === 0L && keptTokens === 0L, lang)
      } else {
        // realized tokens within 4 sigma of the target budget (binomial over docs,
        // loose token-weighted bound: sigma <= sqrt(n*p(1-p)) * max_doc_tokens)
        val p = budget.toDouble / total
        val nDocs = docs.filter(col("lang") === lang).count()
        val maxTok = docs.filter(col("lang") === lang)
          .select(max(size(split(col("text"), " ")))).head.getInt(0).toLong
        val sigma = math.sqrt(nDocs * p * (1 - p)) * maxTok
        assert(math.abs(keptTokens - budget) <= 4 * sigma + maxTok,
          s"$lang realized $keptTokens vs budget $budget (4-sigma $sigma)")
      }
    }
    // the mix rows themselves reconcile with the report
    val byLang = mix1.groupBy(_.getString(1)).view
      .mapValues(rs => (rs.length.toLong, rs.map(_.getLong(2)).sum)).toMap
    stats.foreach { case (lang, (_, _, _, nKept, keptTokens)) =>
      val (n, t) = byLang.getOrElse(lang, (0L, 0L))
      assert((n, t) === (nKept, keptTokens), lang)
    }
  }

  test("curate_pipeline: strict subset, funnel-respecting, contiguous packing") {
    val out = Curation.curatePipeline(docs).collect()
    val outIds = out.map(_.getLong(0)).toSet
    assert(out.nonEmpty && outIds.size < docs.count(), "pipeline must filter")
    // no funnel-rejected doc can survive the composition
    val rejected = Curation.qualityFilter(docs).filter(col("kept") === 0)
      .select(col("doc_id")).as[Long].collect().toSet
    assert(outIds.intersect(rejected).isEmpty)
    // packing over the filtered set is contiguous: windows restart exactly where
    // the previous doc ended (token positions have no gaps across filtered-out ids)
    val sorted = out.sortBy(_.getLong(0))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        val aEnd = a.getLong(2) * graft.operators.Packing.Capacity + a.getLong(4) + a.getLong(1)
        val bStart = b.getLong(2) * graft.operators.Packing.Capacity + b.getLong(4)
        assert(bStart === aEnd, s"gap between ${a.getLong(0)} and ${b.getLong(0)}")
      case _ =>
    }
  }
}
