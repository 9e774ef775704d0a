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

  /** Benchmark decontamination: eval set = every 50th doc; a training doc is
    * contaminated iff it shares ANY distinct 8-gram with any eval doc.
    * Output (doc_id, n_hits, contaminated). */
  def decontaminate(documents: DataFrame, n: Int = 8, evalMod: Int = 50): DataFrame = {
    def sh(df: DataFrame) = df.select(col("doc_id"),
      explode(array_distinct(TextAnalysis.shingles(col("text"), n))).as("s"))
    val evalSh = sh(documents.filter(col("doc_id") % evalMod === 0))
      .select(col("s")).distinct()
    val train = documents.filter(col("doc_id") % evalMod =!= 0)
    val hits = sh(train)
      .join(broadcast(evalSh), Seq("s"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    train.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_hits"), lit(0L)) > 0, 1).otherwise(0).as("contaminated"))
      .orderBy(col("doc_id"))
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
