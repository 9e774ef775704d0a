package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Training-data hygiene operators — the quality-filtering passes a pretraining
 * pipeline runs between extraction and training:
 *
 *  - [[repetition]]: intra-document duplicate-n-gram ratio (Gopher-rule style
 *    repetition signal);
 *  - [[decontaminate]]: benchmark decontamination — flag training documents sharing
 *    any 8-gram shingle with the held-out set;
 *  - [[piiRedact]]: deterministic PII scrubbing (email + long-digit patterns) with
 *    redaction counts and content hash of the scrubbed text.
 *
 * Scale designs: repetition and redaction are shuffle-free per-row Catalyst;
 * decontamination joins the training shingle stream against the BROADCAST eval
 * shingle set (the held-out corpus is always orders of magnitude smaller than the
 * training corpus), so the only wide op is the per-doc hit count.
 */
object Hygiene {

  /** Duplicate 3-gram ratio per document: floor(1e6 * (n - distinct) / n). */
  def repetition(documents: DataFrame): DataFrame = {
    val sh = TextAnalysis.shingles(col("text"), 3)
    val ns = size(sh).cast("long")
    val nd = size(array_distinct(sh)).cast("long")
    documents.select(
      col("doc_id"),
      ns.as("n_shingles"),
      nd.as("n_distinct"),
      floor(lit(1000000.0) * (ns - nd) / ns).cast("long").as("dup_ratio_e6")
    ).orderBy(col("doc_id"))
  }

  private def shingled(df: DataFrame, n: Int): DataFrame = df.select(col("doc_id"),
    explode(array_distinct(TextAnalysis.shingles(col("text"), n))).as("s"))

  /** Per-doc hit counts -> the (doc_id, n_hits, contaminated) output contract. */
  private def hitsToOutput(train: DataFrame, hits: DataFrame): DataFrame =
    train.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, 1).otherwise(0).as("contaminated"))
      .orderBy(col("doc_id"))

  /** Benchmark decontamination: eval set = every 50th doc; a training doc is
    * contaminated iff it shares ANY distinct 8-gram with any eval doc.
    * Output (doc_id, n_hits, contaminated). */
  def decontaminate(documents: DataFrame, n: Int = 8, evalMod: Int = 50): DataFrame = {
    val evalSh = shingled(documents.filter(col("doc_id") % evalMod === 0), n)
      .select(col("s")).distinct()
    val train = documents.filter(col("doc_id") % evalMod =!= 0)
    val hits = shingled(train, n)
      .join(broadcast(evalSh), Seq("s"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    hitsToOutput(train, hits)
  }

  /**
   * The TWO-TIER scale form of [[decontaminate]]: a Bloom filter built over the
   * eval shingles (distributed `stat.bloomFilter` aggregation, then one compact
   * broadcast) PRE-FILTERS the training shingle stream before the exact join runs.
   * The Bloom tier has false positives but NO false negatives, and the exact
   * semi-join stage removes every false positive — so the output is PROVABLY
   * byte-identical to [[decontaminate]] (HygieneBloomSpec asserts it at fpp up to
   * 0.5; the registered query shares the exact form's DuckDB oracle, which is the
   * same proof under the gate).
   *
   * Why it matters at 100 TB: the exact form streams EVERY training shingle into
   * the broadcast-join probe; with a clean corpus ~all of them miss. The Bloom
   * tier turns that into a codegen'd-probe discard at ~10 bits/eval-shingle of
   * broadcast state, so the join stage sees only the contaminated tail + fpp
   * noise — and a raw eval-shingle set too large to broadcast comfortably still
   * fits as a filter (1e9 eval shingles ≈ 1.2 GB at 1% fpp vs tens of GB raw).
   *
   * The probe is Spark's own native [[BloomFilterMightContain]] over an
   * `xxhash64(s)` key — the exact build/probe pair InjectRuntimeFilter plants for
   * runtime row-level filtering — NOT a Scala UDF: the per-row probe runs on EVERY
   * training shingle, so at 100 TB it dominates the scan, and a ScalaUDF there
   * breaks whole-stage codegen exactly where it hurts most (VERDICT r4). The
   * filter is built by the distributed [[BloomFilterAggregate]] (map-side partial
   * merge) and only the serialized sketch reaches the driver — bounded model
   * state, the same contract as the k-means/PQ codebooks. Hash parity build/probe
   * side is by construction (both sides key on xxhash64 of the shingle string);
   * no-false-negatives is therefore preserved and the exact tier-2 join still
   * removes every false positive. PlanSpec pins the no-ScalaUDF shape.
   */
  def decontaminateBloom(documents: DataFrame, n: Int = 8, evalMod: Int = 50,
      fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    import org.apache.spark.util.sketch.BloomFilter
    val evalSh = shingled(documents.filter(col("doc_id") % evalMod === 0), n)
      .select(col("s")).distinct()
      .localCheckpoint(eager = false) // feeds sizing, the filter build, AND the join
    val expected = math.max(evalSh.count(), 1L) // one tiny job; eval set is bounded
    val numBits = math.max(BloomFilter.optimalNumOfBits(expected, fpp), 64L)
    val bfAgg = ColumnBridge.column(new BloomFilterAggregate(
      ColumnBridge.expression(xxhash64(col("s"))),
      Literal(expected), Literal(numBits)).toAggregateExpression())
    // one distributed build job; the driver sees only the serialized sketch
    val bfBytes = evalSh.agg(bfAgg.as("bf")).head().getAs[Array[Byte]]("bf")
    val mightContain = ColumnBridge.column(BloomFilterMightContain(
      Literal(bfBytes, BinaryType),
      ColumnBridge.expression(xxhash64(col("s")))))
    val train = documents.filter(col("doc_id") % evalMod =!= 0)
    val hits = shingled(train, n)
      .filter(mightContain) // tier 1: codegen'd native probe, no false negatives
      .join(broadcast(evalSh), Seq("s")) // tier 2: exact — removes false positives
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    hitsToOutput(train, hits)
  }

  private val EmailRe = "[a-z0-9]+@[a-z]+[.][a-z]+"
  private val LongNumRe = "[0-9]{6,}"

  /** documents + deterministic PII injected into every 7th doc (mirrored in the
    * oracle), so the scrubber has real work at every sf. */
  def withPii(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"),
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com ref 99123456789")))
        .otherwise(col("text")).as("text"))

  /** Scrub emails -> <EMAIL>, 6+-digit runs -> <NUM>; report counts + the scrubbed
    * content hash (never the raw text). */
  def piiRedact(docsWithPii: DataFrame): DataFrame = {
    val emails = size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("long")
    val nums = size(regexp_extract_all(col("text"), lit(LongNumRe), lit(0))).cast("long")
    val redacted = regexp_replace(
      regexp_replace(col("text"), EmailRe, "<EMAIL>"), LongNumRe, "<NUM>")
    docsWithPii.select(
      col("doc_id"),
      emails.as("n_emails"),
      nums.as("n_nums"),
      length(col("text")).cast("long").as("len_before"),
      length(redacted).cast("long").as("len_after"),
      md5(redacted).as("redacted_md5")
    ).orderBy(col("doc_id"))
  }
}
