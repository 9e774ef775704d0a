package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import graft.operators.{EngineConfig, ExtractPipeline, SpanMetricsAgg}
import org.apache.spark.sql.{Column, DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Snapshot-committed, resumable extraction sink (SURVEY.md §7 step 5) — the Iceberg-style
 * commit protocol required by the north rule ("resumable from checkpoint with
 * per-partition lineage + metrics"), with no Iceberg runtime on the classpath.
 *
 * The protocol is the distributed form of the reference's language-pack download
 * (uiucprescon/ocr/languages.py:130-179), its only durable write:
 *
 *   1. skip-if-content-hash-matches idempotency  (languages.py:135-145)
 *        -> a committed bucket whose manifest hash still matches its files is never
 *           re-extracted; resume filters it out BEFORE the OCR island, so no engine
 *           work repeats;
 *   2. stream to a temp location                 (languages.py:146-163)
 *        -> each wave writes parquet to `<out>/staging/bucket=<b>`;
 *   3. verify content hash                       (languages.py:168-169)
 *        -> lineage metrics are computed by RE-READING the staged parquet (write-path
 *           corruption surfaces here, not at some later consumer), and the manifest
 *           records an md5 over the bucket's data files;
 *   4. atomic rename to the final name           (languages.py:174-175)
 *        -> publish of the bucket directory and the manifest republish, both through
 *           the [[CommitIo]] seam (atomic rename on POSIX/HDFS; metadata-pointer swap
 *           on object stores — see [[CommitIo]]). A crash at ANY point leaves either
 *           a fully committed bucket (manifest + data agree) or an invisible one
 *           (staging only) — never a half-read state.
 *
 * Scale design: work is keyed by `bucket = doc_num % nBuckets` (doc_id's numeric suffix,
 * so the assignment is reproducible in plain SQL and uniform by construction). Buckets
 * are processed in WAVES of `waveSize`, one Spark action per wave, committing after each
 * — at 10^12 documents a monolithic job has no commit points, whereas wave granularity
 * bounds re-work after a failure to one wave while keeping full cluster parallelism
 * within it. When the input table carries a `bucket` PARTITION column equal to the
 * same bucket expression ([[graft.sources.Interleave.materializedDocsBucketed]] — the
 * production layout), the wave/resume filter prunes AT THE SCAN (`PartitionFilters`):
 * each wave reads only its own buckets' bytes and a 99%-committed resume reads 1% of
 * the corpus, not all of it. Unpartitioned inputs (live synthesis) fall back to the
 * post-scan filter.
 *
 * Per-bucket lineage = one [[graft.operators.SpanMetricsAgg]] pass (custom Aggregator,
 * map-side partials) + engine version (the F1/F2 version-introspection analogues,
 * uiucprescon/ocr/utils.cpp:4-6) + wall time.
 */
object SnapshotSink {

  /** Default bucket count — single-sourced: the oracle SQL mirrors interpolate this
    * constant ([[graft.functions.OracleSql.SnapshotBuckets]]) so a change here cannot
    * silently desynchronize the DuckDB side (ADVICE r3). */
  val DefaultBuckets = 8

  /** One committed bucket in the manifest. `files`/`file_sizes`/`file_hashes` are
    * parallel arrays: per-data-file name, byte size, and md5 — recorded at commit
    * time by a distributed hash job (executors stream the bytes; the driver only
    * ever sees 32-char digests). `content_hash` is the md5 over the sorted
    * (name:size:md5) lines — one digest summarizing the bucket.
    *
    * `bucket` is a LONG: streaming commits composite ids `generation * nBuckets + b`
    * ([[commitStreamBatch]]), and an Int id would cap a stream's lifetime at ~2^28
    * batches before overflowing mid-flight (ADVICE r3). Batch ids stay tiny
    * (0 until nBuckets); JSON is untyped so old manifests read back unchanged. */
  final case class ManifestEntry(
      bucket: Long,
      rows: Long,
      content_hash: String,
      files: Seq[String],
      file_sizes: Seq[Long],
      file_hashes: Seq[String],
      engine_version: String,
      n_spans: Long,
      n_media: Long,
      n_text: Long,
      n_err: Long,
      ocr_chars: Long,
      n_words: Long,
      conf_sum: Double,
      wall_ms: Long)

  final case class SnapshotReport(
      processed: Seq[Long],
      skipped: Seq[Long],
      invalidated: Seq[Long],
      totalRows: Long)

  /** Outcome of a [[compact]] run. `generation` is the new generation index (or the
    * highest existing one on a no-op); `mergedEntries` counts the source manifest
    * entries rewritten away. */
  final case class CompactReport(
      generation: Long,
      compactedBases: Seq[Long],
      mergedEntries: Long,
      rows: Long,
      noop: Boolean)

  /** Deterministic bucket assignment from the doc_id's numeric suffix
    * ('doc-0000000000042' — 13 digits, [[graft.sources.Interleave.DocIdDigits]]). */
  def bucketOf(docId: Column, nBuckets: Int): Column =
    pmod(substring(docId, 5, Interleave.DocIdDigits).cast("long"), lit(nBuckets))
      .cast("int")

  /** Injected-crash hook for the kill/resume test; mirrors the reference's
    * download-interruption handling (languages.py:176-178). */
  final class InjectedCrash(wave: Int)
      extends RuntimeException(s"injected crash after wave $wave")

  /**
   * Run (or resume) the resumable extraction of `docs` into `outDir`.
   * Committed buckets are skipped upstream of the OCR island; buckets whose files no
   * longer match their manifest hash are invalidated and re-extracted.
   *
   * If `docs` has a `bucket` column it MUST equal `bucketOf(doc_id, nBuckets)` (the
   * [[graft.sources.Interleave.materializedDocsBucketed]] layout); it is then used
   * directly as the wave filter so a partitioned source prunes at the scan.
   */
  def run(
      docs: DataFrame,
      outDir: String,
      nBuckets: Int = DefaultBuckets,
      waveSize: Int = 4,
      config: EngineConfig = EngineConfig.default,
      crashAfterWaves: Int = Int.MaxValue,
      deepVerify: Boolean = true,
      io: CommitIo = PosixCommitIo): SnapshotReport = {
    val spark = docs.sparkSession
    val out = Paths.get(outDir)
    val dataDir = out.resolve("data")
    Files.createDirectories(dataDir)

    // -- step 1: idempotent skip via content hash ---------------------------------
    // (name+size check is driver-side METADATA only; the byte-level hash check runs
    // as ONE batched distributed job over every fast-passing bucket — at 100 TB the
    // driver never re-reads committed data and the job count stays O(1), not
    // O(buckets))
    val existing = readManifest(spark, outDir)

    if (docs.columns.contains("bucket")) {
      // Layout guard, two tiers. (1) Range: the column MUST lie in [0, nBuckets). A
      // wrong nBuckets (e.g. a 16-bucket layout into an 8-bucket run) leaves values
      // >= nBuckets matching NO wave filter — documents silently never extracted,
      // manifests "successfully" committed short. The range check is
      // pruning-resolved on a partitioned source (zero file reads when clean).
      // NULL included: NULL < 0 is NULL, so a bare range filter would pass NULL
      // buckets, which then match NO wave's isin filter — the same silent-loss
      // class as out-of-range values
      val bad = docs.filter(col("bucket").isNull
          || col("bucket") < 0 || col("bucket") >= nBuckets)
        .limit(1).count()
      require(bad == 0,
        s"input `bucket` column has NULLs or values outside [0, $nBuckets) — " +
          "bucket-layout / nBuckets mismatch would silently drop documents")
      // (2) Agreement: an IN-RANGE but wrong-function column (e.g. a constant) can
      // pass tier 1 AND commitWaveFlat's stray-bucket gate whenever the misassigned
      // rows' true buckets fall inside the committing wave — in particular any
      // single-wave commit (waveSize >= nBuckets). The initial commit would then
      // succeed, but a later resume of one invalidated bucket filters by the wrong
      // column, stages zero rows, and empty-wave handling would commit the bucket as
      // legitimately empty — silent data loss (ADVICE r3). So on the INITIAL commit
      // (no manifest yet — the job reads the whole corpus anyway, and one extra
      // two-column pass is noise next to OCR) assert column == bucketOf(doc_id)
      // everywhere. Resumes skip this scan to keep partition pruning intact; they
      // are covered by the non-empty refusal below.
      if (existing.isEmpty) {
        val mismatch = docs
          .filter(col("bucket") =!= bucketOf(col("doc_id"), nBuckets))
          .limit(1).count()
        require(mismatch == 0,
          s"input `bucket` column disagrees with bucketOf(doc_id, $nBuckets) — " +
            "an in-range wrong bucket column would silently mis-route documents")
      }
    }
    val (valid, invalid) = verifyEntries(spark, out, existing, deepVerify)
    // A NON-canonical manifest (multi-generation, mid-flight stream) with a
    // failed-verify composite bucket must fail LOUDLY before anything is deleted:
    // run() can only re-extract base buckets 0..nBuckets-1 from the source corpus,
    // so deleting a composite id's data here would be unrecoverable (the stream
    // checkpoint has advanced past that batch) while the manifest still lists it.
    // Heal path for streams: re-deliver the batch, or compact() verified
    // generations first.
    require(
      existing.map(_.bucket % nBuckets).distinct.size == existing.size
        || invalid.isEmpty,
      s"bucket(s) ${invalid.map(_.bucket).sorted.mkString(",")} fail verification " +
        "in a non-canonical (multi-generation stream) manifest — run() cannot " +
        "re-extract composite stream ids; re-deliver the stream batch or compact() " +
        "the verified generations first")
    invalid.foreach(e => deleteRecursively(dataDir.resolve(s"bucket=${e.bucket}")))
    // Resume-side half of the layout guard: a bucket being RE-extracted whose prior
    // manifest entry recorded rows > 0 must not stage empty — that is the silent-loss
    // signature of an in-range wrong bucket column on a resume (the agreement scan
    // above only runs on initial commits). Legitimately-empty buckets (prior rows == 0)
    // stay re-committable as empty.
    val mustBeNonEmpty = invalid.filter(_.rows > 0).map(_.bucket).toSet
    var manifest = valid.sortBy(_.bucket)
    // Generation-aware resume: a COMPACTED snapshot's entries live at
    // `gen*nBuckets + base` ([[compact]]). Whenever each base bucket appears at most
    // once in the manifest (canonical — trivially true for fresh/batch manifests,
    // where id == base, and true by construction after compaction), resume works per
    // BASE and re-commits an invalidated bucket under its EXISTING manifest id, so
    // compaction never breaks the heal-from-source path. On a NON-canonical manifest
    // (a mid-flight stream with several generations per base) run() extracts
    // NOTHING: with multiple generations live, "base bucket b is missing" cannot be
    // distinguished from "batch for b hasn't arrived yet", and committing a fresh
    // extraction at the base ids would DUPLICATE every streamed row the moment both
    // are read back. Verify-only + loud invalid refusal (above) is the safe
    // contract; healing composite ids belongs to stream re-delivery / compact().
    val canonical = existing.map(_.bucket % nBuckets).distinct.size == existing.size
    val idOfBase: Long => Long = {
      val m = existing.map(e => (e.bucket % nBuckets) -> e.bucket).toMap
      b => m.getOrElse(b, b)
    }
    val validIds = valid.map(_.bucket).toSet
    val todo =
      if (canonical) (0L until nBuckets).filterNot(b => validIds(idOfBase(b)))
      else Seq.empty[Long]

    val processed = Seq.newBuilder[Long]
    var totalRows = 0L
    val waves = todo.grouped(waveSize).toSeq

    waves.zipWithIndex.foreach { case (baseWave, wi) =>
      val t0 = System.nanoTime()
      // -- step 2: extract the wave's buckets into staging ------------------------
      // The filter sits on the INPUT side of the pipeline: a resumed job never pays
      // decode/OCR for committed work (the expensive step is the one being saved,
      // exactly like the reference skipping a re-download on hash match). Against a
      // bucket-PARTITIONED source this is a partition filter — the scan itself reads
      // only the wave's buckets (SnapshotResumeSpec asserts PartitionFilters + the
      // pruned partition count); otherwise it prunes post-scan.
      // Int literals, not Long: base bucket ids always fit (< nBuckets), and a Long
      // literal would type-coerce the int `bucket` partition column through a cast,
      // defeating the scan-level partition pruning this filter exists for.
      val waveInts = baseWave.map(_.toInt)
      val docsW =
        if (docs.columns.contains("bucket"))
          docs.filter(col("bucket").isin(waveInts: _*)).drop("bucket")
        else docs.filter(bucketOf(col("doc_id"), nBuckets).isin(waveInts: _*))
      // Staged rows carry their MANIFEST id (== base for uncompacted snapshots; the
      // compacted-generation id otherwise) so the commit lands at the id the
      // manifest, readBack layout, and verification already use.
      val targetIds = baseWave.map(idOfBase)
      val baseCol = bucketOf(col("doc_id"), nBuckets).cast("long")
      val idCol =
        if (targetIds == baseWave) baseCol
        else baseWave.zip(targetIds).foldLeft(lit(-1L)) { case (acc, (b, id)) =>
          when(baseCol === b, lit(id)).otherwise(acc)
        }
      val flat = ExtractPipeline.extractFlat(docsW, config)
        .withColumn("bucket", idCol)
      val (newManifest, waveRows) =
        commitWaveFlat(spark, out, flat, targetIds, manifest, t0,
          expectNonEmpty = mustBeNonEmpty.intersect(targetIds.toSet), io = io)
      manifest = newManifest
      processed ++= targetIds
      totalRows += waveRows
      if (wi + 1 >= crashAfterWaves) throw new InjectedCrash(wi)
    }
    deleteRecursively(out.resolve("staging"))
    SnapshotReport(processed.result(), valid.map(_.bucket).sorted,
      invalid.map(_.bucket).sorted, totalRows)
  }

  /** Read the committed span table back (flat schema + bucket partition column) by
    * scanning the whole data directory. Fast and planner-friendly (directory-level
    * partition discovery), but it trusts the directory listing — after a CRASHED
    * [[compact]] (orphan source dirs not yet GC'd) it double-reads; run [[vacuum]]
    * first, or use [[readCommitted]], which resolves files through the manifest. */
  def readBack(spark: SparkSession, outDir: String): DataFrame =
    spark.read.parquet(Paths.get(outDir).resolve("data").toString)

  /** Manifest-resolved read (Iceberg semantics: the manifest IS the table): scan
    * exactly the data files the manifest lists, so orphan directories — a crashed
    * [[compact]]'s un-GC'd sources, an abandoned write — are invisible without any
    * vacuum. The `basePath` option keeps the `bucket` partition column. Falls back
    * to an empty [[readBack]] frame when the manifest lists no files (all-empty
    * buckets) so callers always get the committed schema. */
  def readCommitted(spark: SparkSession, outDir: String): DataFrame = {
    val dataPath = Paths.get(outDir).resolve("data")
    val files = readManifest(spark, outDir).flatMap(e =>
      e.files.map(f => bucketDir(Paths.get(outDir), e.bucket).resolve(f).toString))
    if (files.isEmpty) emptyCommitted(spark, outDir)
    else spark.read.option("basePath", dataPath.toString).parquet(files: _*)
  }

  /** Empty frame in the committed schema. When EVERY bucket is empty there is no
    * parquet file to infer from — surface a precise error instead of Spark's
    * opaque schema-inference failure (a snapshot whose data never had a single row
    * carries no schema; callers must get it from the producing pipeline). */
  private def emptyCommitted(spark: SparkSession, outDir: String): DataFrame =
    try readBack(spark, outDir).limit(0)
    catch {
      case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalStateException(
          s"snapshot at $outDir has a valid manifest but zero data files in every " +
            "bucket — an all-empty snapshot carries no schema to read back; take " +
            "the schema from the producing pipeline instead", e)
    }

  /** Parse the manifest (empty if none exists yet). Read through Spark's JSON source
    * with the case-class schema — no extra JSON dependency. */
  /** Sidecar transaction log for the streaming sink (`stream-batches.json`, JSON
    * lines of {batch, base}): maps EXTERNAL micro-batch ids to their allocated
    * composite base so (a) a re-delivered batch reuses its allocation and the
    * skip-verify stays idempotent, and (b) allocations and compaction generations
    * share one strictly-increasing id space. Written atomically through the same
    * [[CommitIo]] seam as manifests; a crash between allocation and data commit
    * just leaves a reserved generation the re-delivery fills in. */
  private[sources] def readBatchBases(out: Path): Map[Long, Long] = {
    val p = out.resolve("stream-batches.json")
    if (!Files.exists(p)) return Map.empty
    val Line = """\{"batch":(-?\d+),"base":(-?\d+)\}""".r
    Files.readAllLines(p).asScala.flatMap {
      case Line(b, base) => Some(b.toLong -> base.toLong)
      case _ => None
    }.toMap
  }

  private def recordBatchBases(out: Path, io: CommitIo, m: Map[Long, Long]): Unit = {
    val body = m.toSeq.sorted
      .map { case (b, base) => s"""{"batch":$b,"base":$base}""" }
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(out, ".batches", ".tmp")
    Files.writeString(tmp, body)
    io.publishFile(tmp, out.resolve("stream-batches.json"))
  }

  /** Sidecar log of COMPACTED-AWAY composite ids (`compacted-ids.json`, JSON lines
    * of {"bucket":N}): every id [[compact]] merges into a canonical generation is
    * recorded here BEFORE its source directory is GC'd. [[commitStreamBatch]]
    * skips these ids on re-delivery — without the log, a batch replayed after an
    * ill-timed compaction (crash between sink commit and checkpoint advance, then
    * compact + takedown while the stream is down) would find its ids missing from
    * the manifest and RE-COMMIT them: every row duplicated against the canonical
    * generation and, worse, takedown-deleted documents RESURRECTED
    * (StreamingTakedownSpec drives exactly that interleave). A batch that merely
    * reserved a generation but crashed before committing data is NOT in this log,
    * so its re-delivery still commits — no data loss. */
  private[graft] def readCompactedIds(out: Path): Set[Long] = {
    val p = out.resolve("compacted-ids.json")
    if (!Files.exists(p)) return Set.empty
    val Line = """\{"bucket":(-?\d+)\}""".r
    Files.readAllLines(p).asScala.flatMap {
      case Line(b) => Some(b.toLong)
      case _ => None
    }.toSet
  }

  private def recordCompactedIds(out: Path, io: CommitIo, ids: Set[Long]): Unit = {
    val body = ids.toSeq.sorted.map(b => s"""{"bucket":$b}""")
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(out, ".compacted", ".tmp")
    Files.writeString(tmp, body)
    io.publishFile(tmp, out.resolve("compacted-ids.json"))
  }

  /** Audit entry point: run the two verification tiers over the ENTIRE manifest
    * and return the bucket ids that FAIL (empty = every committed byte verifies).
    * Deep mode re-hashes all data files in one distributed job — the post-incident
    * check an operator runs after takedowns, compactions, or stream restarts. */
  def verifySnapshot(spark: SparkSession, outDir: String,
      deepVerify: Boolean = true): Seq[Long] = {
    val out = Paths.get(outDir)
    val (_, invalid) = verifyEntries(spark, out, readManifest(spark, outDir), deepVerify)
    invalid.map(_.bucket).sorted
  }

  /** [[verifySnapshot]] against a named BRANCH's manifest — the audit step of
    * write-audit-publish: run it (with the branch reads) on the staged result
    * before [[fastForward]] publishes it to main. */
  def verifySnapshotAtBranch(spark: SparkSession, outDir: String, name: String,
      deepVerify: Boolean = true): Seq[Long] = {
    val out = Paths.get(outDir)
    val entries = readManifestAt(spark, outDir, resolveBranch(outDir, name))
    val (_, invalid) = verifyEntries(spark, out, entries, deepVerify)
    invalid.map(_.bucket).sorted
  }

  def readManifest(spark: SparkSession, outDir: String): Seq[ManifestEntry] =
    parseManifest(spark, Paths.get(outDir).resolve("manifest.json"))

  private def parseManifest(spark: SparkSession, p: Path): Seq[ManifestEntry] = {
    if (!Files.exists(p)) return Seq.empty
    val enc = Encoders.product[ManifestEntry]
    spark.read.schema(enc.schema).json(p.toString).as[ManifestEntry](enc)
      .collect().toSeq
  }

  /** Manifest as a DataFrame (the lineage/metrics table surfaced to queries). */
  def lineage(spark: SparkSession, outDir: String): DataFrame = {
    val enc = Encoders.product[ManifestEntry]
    spark.createDataset(readManifest(spark, outDir))(enc).toDF()
  }

  // ---- time travel ------------------------------------------------------------------
  //
  // Every manifest publish ([[writeManifest]]) also writes an IMMUTABLE history copy
  // `manifest-v%06d.json` before swapping `manifest.json` (the HEAD pointer) — the
  // Iceberg metadata-version sequence, with the same retention contract: a historical
  // version stays READABLE ([[readCommittedAt]]) for as long as the data files it
  // references are retained. The protocol's eager GC points — [[compact]]'s post-swap
  // source-directory delete, [[vacuum]], and [[run]]'s invalidated-bucket delete — are
  // the `expireSnapshots` analogue: they reclaim bytes and thereby expire every version
  // that referenced them. Reading an expired version fails LOUDLY with the missing-file
  // count, never silently short. History files themselves are O(bytes-of-metadata);
  // [[expireVersions]] prunes them when a bounded history is wanted.

  private val VersionFileRe = "manifest-v(\\d+)\\.json".r

  private def versionPath(out: Path, v: Long): Path =
    out.resolve(f"manifest-v$v%06d.json")

  /** Available history versions, ascending (empty for a pre-history snapshot). */
  def versions(outDir: String): Seq[Long] = {
    val out = Paths.get(outDir)
    if (!Files.isDirectory(out)) return Seq.empty
    val stream = Files.list(out)
    try stream.iterator().asScala.toSeq
      .flatMap(p => p.getFileName.toString match {
        case VersionFileRe(n) => Some(n.toLong)
        case _ => None
      }).sorted
    finally stream.close()
  }

  /** The manifest as of history version `v` (1-based, [[versions]]). */
  def readManifestAt(spark: SparkSession, outDir: String, v: Long): Seq[ManifestEntry] = {
    val p = versionPath(Paths.get(outDir), v)
    require(Files.exists(p),
      s"no manifest version $v under $outDir — available: " +
        s"[${versions(outDir).mkString(", ")}]")
    parseManifest(spark, p)
  }

  /** [[lineage]] as of history version `v`. */
  def lineageAt(spark: SparkSession, outDir: String, v: Long): DataFrame = {
    val enc = Encoders.product[ManifestEntry]
    spark.createDataset(readManifestAt(spark, outDir, v))(enc).toDF()
  }

  /** Time-travel read ([[readCommitted]] at history version `v`): scan exactly the
    * data files that manifest version listed. Fails loudly when the version has been
    * EXPIRED — any referenced file reclaimed by compaction GC, [[vacuum]], or an
    * invalidated-bucket rebuild — rather than returning a silently short table. */
  def readCommittedAt(spark: SparkSession, outDir: String, v: Long): DataFrame = {
    val out = Paths.get(outDir)
    val entries = readManifestAt(spark, outDir, v)
    val files = entries.flatMap(e => e.files.map(f => bucketDir(out, e.bucket).resolve(f)))
    val missing = files.filterNot(Files.isRegularFile(_))
    require(missing.isEmpty,
      s"snapshot version $v is EXPIRED: ${missing.size} of ${files.size} data files " +
        "it references were reclaimed (compaction GC / vacuum / bucket invalidation " +
        "— the expireSnapshots analogue); time travel reaches only versions whose " +
        s"files are retained. First missing: ${missing.head}")
    if (files.isEmpty) emptyCommitted(spark, outDir)
    else spark.read.option("basePath", out.resolve("data").toString)
      .parquet(files.map(_.toString): _*)
  }

  /** Prune manifest history to the newest `keepLast` versions (HEAD `manifest.json`
    * is untouched — it is the current table either way). TAGGED versions ([[tag]])
    * are always retained regardless of age — the Iceberg `expireSnapshots` ref
    * semantics: a named ref pins its snapshot's METADATA against expiration (the
    * data files remain subject to the usual eager-GC points, and a tagged version
    * whose files were reclaimed still fails loudly on read). Returns pruned
    * versions. */
  def expireVersions(outDir: String, keepLast: Int): Seq[Long] = {
    // >= 1, not >= 0: expiring the NEWEST version would let writeManifest re-issue
    // its number with different content, silently corrupting every time-travel /
    // changelog read (and any tag) that resolved the old number
    require(keepLast >= 1, s"keepLast must be >= 1, got $keepLast — version " +
      "numbers are never reused, so the newest history file must survive")
    val out = Paths.get(outDir)
    // tags AND branches pin their versions: expiring a live branch's manifest
    // would orphan every commit staged on it
    val pinned = tags(outDir).values.toSet ++ branches(outDir).values.toSet
    val drop = versions(outDir).dropRight(keepLast).filterNot(pinned)
    drop.foreach(v => Files.deleteIfExists(versionPath(out, v)))
    drop
  }

  /** Outcome of a [[restore]]: the version rolled back to, the NEW version the
    * rollback published as, and how many manifest entries it carries. */
  final case class RestoreReport(toVersion: Long, newVersion: Long, nEntries: Int)

  /** ROLLBACK the table to history version `toVersion` by republishing that
    * version's manifest as a NEW version — the Iceberg `rollback` / Delta RESTORE
    * shape. Metadata-only: no data file is read, written, or moved; HEAD simply
    * points at the old file set again, and the rolled-back-FROM versions stay in
    * history (a restore is an auditable commit, not an erasure — re-restoring
    * forward is just another [[restore]]).
    *
    * Fails LOUDLY ([[IllegalStateException]]) when any file the target version
    * references has been physically reclaimed (a [[deleteDocs]] takedown rewrite,
    * compaction GC, [[vacuum]]): a takedown is deliberately unrecoverable, so a
    * rollback can never resurrect deleted bytes — the same contract as
    * [[readCommittedAt]]'s expired-version guard, checked against recorded sizes
    * (and, with `deepVerify`, a distributed re-hash of every referenced byte).
    *
    * Scale shape: O(metadata) driver work; `deepVerify` adds ONE batched
    * distributed hash job over the restored file set (the commit-time verify tier
    * — executors stream bytes, the driver sees digests).
    *
    * Interaction with GC: after a rollback, buckets introduced after `toVersion`
    * are unreferenced by HEAD; [[vacuum]] would reclaim them and EXPIRE the
    * rolled-back-from versions — run it only once that history is disposable.
    * Tags are untouched (they pin versions, not HEAD). */
  def restore(
      spark: SparkSession,
      outDir: String,
      toVersion: Long,
      deepVerify: Boolean = false,
      io: CommitIo = PosixCommitIo): RestoreReport = {
    val out = Paths.get(outDir)
    val hist = versions(outDir)
    require(hist.contains(toVersion),
      s"cannot restore to version $toVersion — not in history [${hist.mkString(", ")}]")
    val entries = readManifestAt(spark, outDir, toVersion)
    val (valid, invalid) = verifyEntries(spark, out, entries, deepVerify)
    if (invalid.nonEmpty)
      throw new IllegalStateException(
        s"version $toVersion is EXPIRED: ${invalid.size} of ${entries.size} buckets " +
          s"reference reclaimed or altered data files (buckets " +
          s"[${invalid.map(_.bucket).sorted.mkString(", ")}]) — takedown/compaction " +
          "GC is unrecoverable by design; a rollback cannot resurrect deleted bytes")
    writeManifest(out, valid.sortBy(_.bucket), io)
    RestoreReport(toVersion, versions(outDir).last, valid.size)
  }

  // ---- named refs (tags) --------------------------------------------------------
  //
  // Iceberg-style named references into the version history: a tag is an immutable
  // name -> version pointer ("the snapshot training run 7 read from"), resolved at
  // read time through the same time-travel machinery. Refs live in `refs.json`
  // (JSON lines, one per tag) and publish through the CommitIo seam like every
  // other metadata swap — a crash mid-retag leaves either the old or the new refs
  // file, never a torn one.

  private val TagNameRe = "[A-Za-z0-9._-]{1,64}".r

  /** Current tags, name -> version (empty if none). */
  def tags(outDir: String): Map[String, Long] = {
    val p = Paths.get(outDir).resolve("refs.json")
    if (!Files.exists(p)) return Map.empty
    val TagLine = """\{"name":"([^"]+)","version":(\d+)\}""".r
    Files.readAllLines(p).asScala.flatMap {
      case TagLine(n, v) => Some(n -> v.toLong)
      case _ => None
    }.toMap
  }

  /** Create or move the named tag to history version `v` (which must exist NOW —
    * a tag can never be born dangling; it can only dangle later if the version's
    * data files are reclaimed, and then reads fail loudly like any expired read). */
  def tag(outDir: String, name: String, v: Long,
      io: CommitIo = PosixCommitIo): Unit = {
    require(TagNameRe.matches(name),
      s"tag name '$name' must match ${TagNameRe.regex}")
    require(versions(outDir).contains(v),
      s"cannot tag version $v — not in history [${versions(outDir).mkString(", ")}]")
    writeTags(Paths.get(outDir), tags(outDir) + (name -> v), io)
  }

  /** Remove the named tag (idempotent), releasing its expiration pin. */
  def dropTag(outDir: String, name: String, io: CommitIo = PosixCommitIo): Unit = {
    val t = tags(outDir)
    if (t.contains(name)) writeTags(Paths.get(outDir), t - name, io)
  }

  private def resolveTag(outDir: String, name: String): Long =
    tags(outDir).getOrElse(name,
      throw new IllegalArgumentException(
        s"no tag '$name' under $outDir — available: " +
          s"[${tags(outDir).keys.toSeq.sorted.mkString(", ")}]"))

  /** [[readCommittedAt]] resolved through a named tag. */
  def readCommittedAtTag(spark: SparkSession, outDir: String, name: String): DataFrame =
    readCommittedAt(spark, outDir, resolveTag(outDir, name))

  /** [[lineageAt]] resolved through a named tag. */
  def lineageAtTag(spark: SparkSession, outDir: String, name: String): DataFrame =
    lineageAt(spark, outDir, resolveTag(outDir, name))

  private def writeTags(out: Path, t: Map[String, Long], io: CommitIo): Unit = {
    val body = t.toSeq.sortBy(_._1)
      .map { case (n, v) => s"""{"name":"$n","version":$v}""" }
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(out, ".refs", ".tmp")
    Files.writeString(tmp, body)
    io.publishFile(tmp, out.resolve("refs.json"))
  }

  // ---- named refs (branches) ----------------------------------------------------
  //
  // Iceberg-style WRITABLE refs: a branch is a name -> version pointer that
  // ADVANCES when the branch is committed to ([[upsertDocsToBranch]]) — the
  // write-audit-publish (WAP) shape: stage a merge on an isolated branch, audit it
  // with the same manifest-resolved reads and two-tier verification as main, then
  // [[fastForward]] main onto it (a metadata-only republish, the [[restore]]
  // machinery). Branch commits share main's one linear version history (every
  // branch commit publishes a normal immutable `manifest-v%06d.json`); isolation
  // comes from the DATA layout — a branch rewrite lands its buckets at a fresh
  // GENERATION (`gen * nBuckets + base`, the compaction/stream id space, reserved
  // through the same sidecar ledger so streams and compactions can never collide
  // with it) and main's files are never touched. Branches live in `branches.json`
  // (same JSON-lines shape and CommitIo swap as tags — kept separate so a tag
  // rewrite can never drop branch pointers). Like tags, a branch pins its version
  // against [[expireVersions]]; unlike tags, a branch's referenced buckets also
  // pin their BYTES against [[vacuum]] (a branch is a live line of development —
  // reclaiming under it would destroy uncommitted-to-main work).

  /** Current branches, name -> version (empty if none). */
  def branches(outDir: String): Map[String, Long] =
    branchRefs(outDir).view.mapValues(_._1).toMap

  /** Branch refs with their recorded fork point: name -> (head version, the MAIN
    * HEAD version when the branch was created). The base is what makes
    * [[fastForward]] safe: publishing a branch whose base is behind main's current
    * HEAD would silently discard everything main committed since the fork. */
  private def branchRefs(outDir: String): Map[String, (Long, Long)] = {
    val p = Paths.get(outDir).resolve("branches.json")
    if (!Files.exists(p)) return Map.empty
    val Line = """\{"name":"([^"]+)","version":(\d+),"base":(\d+)\}""".r
    Files.readAllLines(p).asScala.flatMap {
      case Line(n, v, b) => Some(n -> (v.toLong, b.toLong))
      case _ => None
    }.toMap
  }

  /** Create (or move) the named branch at history version `v` — like [[tag]], a
    * branch can never be born dangling. Records main's CURRENT head version as the
    * branch's fork base ([[fastForward]] refuses to publish over a main that
    * advanced past it). */
  def branch(outDir: String, name: String, v: Long,
      io: CommitIo = PosixCommitIo): Unit = {
    require(TagNameRe.matches(name),
      s"branch name '$name' must match ${TagNameRe.regex}")
    require(versions(outDir).contains(v),
      s"cannot branch at version $v — not in history [${versions(outDir).mkString(", ")}]")
    val base = headVersion(outDir)
    writeBranches(Paths.get(outDir),
      branchRefs(outDir) + (name -> (v, base)), io)
  }

  /** Remove the named branch (idempotent), releasing its expiration AND vacuum
    * pins — the branch's exclusive generations become reclaimable orphans. */
  def dropBranch(outDir: String, name: String, io: CommitIo = PosixCommitIo): Unit = {
    val b = branchRefs(outDir)
    if (b.contains(name)) writeBranches(Paths.get(outDir), b - name, io)
  }

  /** The version HEAD (manifest.json) currently points at — normally the newest
    * history entry, but BRANCH commits publish history without moving HEAD, so
    * this resolves by content identity against the immutable version files. */
  private def headVersion(outDir: String): Long = {
    val out = Paths.get(outDir)
    val head = out.resolve("manifest.json")
    if (!Files.exists(head)) return 0L
    val body = Files.readString(head)
    versions(outDir).reverse
      .find(v => Files.readString(versionPath(out, v)) == body)
      .getOrElse(0L)
  }

  private def resolveBranch(outDir: String, name: String): Long =
    branches(outDir).getOrElse(name,
      throw new IllegalArgumentException(
        s"no branch '$name' under $outDir — available: " +
          s"[${branches(outDir).keys.toSeq.sorted.mkString(", ")}]"))

  /** [[readCommittedAt]] resolved through a named branch. */
  def readCommittedAtBranch(spark: SparkSession, outDir: String, name: String): DataFrame =
    readCommittedAt(spark, outDir, resolveBranch(outDir, name))

  /** [[lineageAt]] resolved through a named branch. */
  def lineageAtBranch(spark: SparkSession, outDir: String, name: String): DataFrame =
    lineageAt(spark, outDir, resolveBranch(outDir, name))

  /** FAST-FORWARD main onto the named branch: republish the branch's manifest as a
    * NEW HEAD version (the [[restore]] machinery — metadata-only, loud when any
    * referenced byte was reclaimed, optional distributed deep-hash).
    *
    * Refuses ([[IllegalStateException]]) when main's HEAD advanced past the
    * branch's recorded fork base — publishing then would silently DISCARD every
    * commit main took since the fork (the classic write-audit-publish lost-update
    * pitfall; git's own fast-forward refuses identically). Recover by re-branching
    * from the current HEAD and re-applying the merge, or by an explicit [[restore]]
    * if overwriting main is truly intended. After a successful publish the
    * branch's base advances to the new HEAD version, so further branch commits can
    * fast-forward again; the pointer itself stays (Iceberg fast-forward semantics)
    * — drop it with [[dropBranch]] once merged, releasing its vacuum pin. */
  def fastForward(spark: SparkSession, outDir: String, name: String,
      deepVerify: Boolean = false, io: CommitIo = PosixCommitIo): RestoreReport = {
    val refs = branchRefs(outDir)
    val (bv, base) = refs.getOrElse(name,
      throw new IllegalArgumentException(
        s"no branch '$name' under $outDir — available: " +
          s"[${refs.keys.toSeq.sorted.mkString(", ")}]"))
    val head = headVersion(outDir)
    if (head != base)
      throw new IllegalStateException(
        s"not a fast-forward: main HEAD is at version $head but branch '$name' " +
          s"forked at version $base — publishing would discard main's commits " +
          s"since the fork; re-branch from the current HEAD and re-apply, or use " +
          "restore() to overwrite explicitly")
    val report = restore(spark, outDir, bv, deepVerify, io)
    writeBranches(Paths.get(outDir),
      refs + (name -> (bv, report.newVersion)), io)
    report
  }

  private def writeBranches(out: Path, b: Map[String, (Long, Long)],
      io: CommitIo): Unit = {
    val body = b.toSeq.sortBy(_._1)
      .map { case (n, (v, base)) => s"""{"name":"$n","version":$v,"base":$base}""" }
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(out, ".branches", ".tmp")
    Files.writeString(tmp, body)
    io.publishFile(tmp, out.resolve("branches.json"))
  }

  /** Buckets whose committed state DIFFERS between history versions `fromV` and
    * `toV` (new, re-extracted/healed, or compacted-away-and-rewritten buckets).
    * Identity is the recorded FILE LIST (names + sizes + per-file md5), not the
    * logical row counts: a re-extraction of identical documents produces identical
    * rows but new data files, and an incremental consumer keyed on physical state
    * must see it (it cannot know the bytes are equivalent without reading them).
    * Buckets present in `fromV` but absent from `toV` (compaction rewrote them to a
    * new generation id) are NOT returned — the new generation's ids are. */
  def changedBuckets(spark: SparkSession, outDir: String,
      fromV: Long, toV: Long): Seq[Long] = {
    require(fromV <= toV, s"fromV $fromV must be <= toV $toV")
    def key(e: ManifestEntry) = (e.files, e.file_sizes, e.file_hashes)
    val before = readManifestAt(spark, outDir, fromV).map(e => e.bucket -> key(e)).toMap
    readManifestAt(spark, outDir, toV)
      .filter(e => !before.get(e.bucket).contains(key(e)))
      .map(_.bucket).sorted
  }

  /** Incremental read (the changelog consumer's scan): the rows of exactly the
    * buckets [[changedBuckets]] reports between `fromV` and `toV`, resolved through
    * version `toV`'s manifest. At 100 TB this is what a downstream pipeline
    * (re-embedding, re-indexing, derived-table refresh) consumes after a resume or
    * a late-arriving stream batch — O(changed buckets) bytes, never a full-table
    * re-read. Same expiration contract as [[readCommittedAt]]. */
  def readChangesBetween(spark: SparkSession, outDir: String,
      fromV: Long, toV: Long): DataFrame = {
    val out = Paths.get(outDir)
    val changed = changedBuckets(spark, outDir, fromV, toV).toSet
    val entries = readManifestAt(spark, outDir, toV).filter(e => changed(e.bucket))
    val files = entries.flatMap(e => e.files.map(f => bucketDir(out, e.bucket).resolve(f)))
    val missing = files.filterNot(Files.isRegularFile(_))
    require(missing.isEmpty,
      s"incremental read $fromV -> $toV is EXPIRED: ${missing.size} of " +
        s"${files.size} data files were reclaimed. First missing: " +
        missing.headOption.getOrElse("-"))
    if (files.isEmpty) emptyCommitted(spark, outDir)
    else spark.read.option("basePath", out.resolve("data").toString)
      .parquet(files.map(_.toString): _*)
  }

  /** Outcome of a [[deleteDocs]] takedown: rows actually removed and the buckets
    * rewritten (requested ids absent from the snapshot cost nothing). */
  final case class DeleteReport(deletedRows: Long, rewrittenBuckets: Seq[Long])

  /**
   * Row-level DELETE (takedown / right-to-be-forgotten): remove every span of the
   * given doc_ids from the committed snapshot by rewriting ONLY their buckets —
   * copy-on-write at bucket granularity through the same staged-write -> re-read ->
   * publish -> distributed-hash -> manifest-republish cycle as every other write.
   *
   * Scale shape: the bucket function routes each requested id to exactly one bucket
   * driver-side (no scan), so a takedown of k documents over a 10^12-doc snapshot
   * reads and rewrites at most k buckets' bytes — never the table. Buckets whose
   * files contain NO matching rows (id never existed, or already deleted) are left
   * byte-identical, verified cheaply by one pruned count per affected bucket.
   *
   * Deletion is PHYSICAL by design: the rewrite deletes the bucket's old data files,
   * which EXPIRES every history version that referenced them ([[readCommittedAt]]
   * then fails loudly) — for a takedown that is the point; the bytes must actually
   * go away, not linger behind a time-travel read. Manifest history retains only
   * file NAMES and digests of the old state. The id list is driver-side
   * (`isInCollection` -> an in-filter in codegen), the right tool up to ~10^5 ids;
   * batch-scale purges (a whole source, a crawl slice) should instead filter at
   * re-extraction or use an anti-join rewrite via [[compact]]-shaped machinery.
   *
   * Requires a canonical manifest (one entry per base bucket — true for batch
   * snapshots and anything post-[[compact]]); a mid-stream multi-generation id
   * space must compact first, because a doc's rows may straddle generations.
   */
  def deleteDocs(
      spark: SparkSession,
      outDir: String,
      docIds: Seq[String],
      nBuckets: Int = DefaultBuckets,
      io: CommitIo = PosixCommitIo): DeleteReport = {
    require(docIds.nonEmpty, "deleteDocs needs at least one doc_id")
    val out = Paths.get(outDir)
    val existing = readManifest(spark, outDir)
    require(existing.nonEmpty, s"no committed snapshot under $outDir")
    require(existing.map(_.bucket % nBuckets).distinct.size == existing.size,
      "manifest is not canonical (multiple generations per base bucket — an " +
        "un-compacted stream): run compact() first, a document's rows may " +
        "straddle generations")
    val idOfBase = existing.map(e => (e.bucket % nBuckets) -> e.bucket).toMap
    // the same bucket arithmetic as bucketOf, driver-side: numeric doc_id suffix
    val targets = docIds.toSet
    val affected = targets.toSeq
      .map(d => java.lang.Long.parseLong(
        d.drop(4).take(Interleave.DocIdDigits)) % nBuckets)
      .distinct.flatMap(idOfBase.get)
      .filter(b => existing.find(_.bucket == b).exists(_.rows > 0))
      .sorted

    var manifest = existing.sortBy(_.bucket)
    var deleted = 0L
    val rewritten = Seq.newBuilder[Long]
    affected.foreach { b =>
      val entry = manifest.find(_.bucket == b).get
      val files = entry.files.map(f => bucketDir(out, b).resolve(f).toString)
      val cur = spark.read.option("basePath", out.resolve("data").toString)
        .parquet(files: _*)
      val matches = cur.filter(col("doc_id").isInCollection(targets)).count()
      if (matches > 0) {
        val t0 = System.nanoTime()
        // NULL-id bystanders survive (NOT(NULL IN ...) is NULL — a bare filter
        // would drop them from the rewrite; same guard as TableSnapshot.deleteIds)
        val kept = cur
          .filter(col("doc_id").isNull || !col("doc_id").isInCollection(targets))
          .withColumn("bucket", lit(b))
        val (m2, _) = commitWaveFlat(spark, out, kept, Seq(b),
          manifest.filterNot(_.bucket == b), t0, io = io,
          layoutCols = rewriteLayout(kept), spanMetrics = hasSpanMetrics(kept))
        manifest = m2
        deleted += matches
        rewritten += b
      }
    }
    deleteRecursively(out.resolve("staging"))
    DeleteReport(deleted, rewritten.result())
  }

  /** Outcome of an [[upsertDocs]] merge: documents whose rows were replaced
    * (matched), documents newly inserted, the replaced-row count, the upsert-row
    * count, and the buckets rewritten. */
  final case class UpsertReport(
      matchedDocs: Long,
      insertedDocs: Long,
      replacedRows: Long,
      upsertRows: Long,
      rewrittenBuckets: Seq[Long])

  /**
   * Row-level UPSERT / MERGE (the daily-crawl ingest op): every document present in
   * `updates` has ALL of its committed rows REPLACED by its `updates` rows;
   * documents not yet in the snapshot are inserted — bucket-granular copy-on-write
   * through the same staged-write -> re-read -> publish -> distributed-hash ->
   * manifest-republish cycle as every other write. The reference archetype is
   * `_download_languague`'s replace-if-hash-differs idempotency
   * (uiucprescon/ocr/languages.py:135-175): re-delivering the same update set is a
   * no-op in content (the rewrite regenerates byte-identical logical rows), so a
   * merge that crashes mid-flight is healed by simply re-running it — already-merged
   * buckets re-merge idempotently (the anti-join removes the previous upsert's rows
   * by doc_id before re-adding them), un-merged buckets merge for the first time
   * (SnapshotUpsertSpec drives a crash between waves through `crashAfterWaves`).
   *
   * Scale shape: affected buckets are discovered by ONE distributed distinct over
   * the update set's bucket keys (<= nBuckets rows reach the driver — never the doc
   * ids themselves, which at daily-crawl scale are billions); each wave then reads
   * and rewrites ONLY its buckets' committed bytes (manifest-resolved file list),
   * anti-joins out the updated documents' old rows (null-keyed bystanders survive:
   * an anti join never matches a null key), unions the wave's update rows, and
   * commits. A merge touching k buckets reads/writes O(k buckets' bytes + updates),
   * never the table. Unlike [[deleteDocs]] (bounded driver-side id list by design),
   * the update set stays fully distributed.
   *
   * DERIVED-TABLE CASCADE: a re-crawled document's committed derived rows (MinHash
   * signatures, window hashes, tf rows) are stale after the merge — cascade with
   * [[TableSnapshot.deleteIds]] per derived table for the touched ids, exactly like
   * the takedown cascade; the next derived-table resume re-derives them from the
   * merged corpus. Cascade order: corpus first, derived tables second.
   *
   * Requires a canonical manifest (one entry per base bucket) for the same reason
   * as [[deleteDocs]]: a doc's rows may straddle generations mid-stream — compact
   * first. `updates` must carry exactly the committed table's columns (no bucket).
   */
  def upsertDocs(
      spark: SparkSession,
      outDir: String,
      updates: DataFrame,
      nBuckets: Int = DefaultBuckets,
      waveSize: Int = 4,
      crashAfterWaves: Int = Int.MaxValue,
      io: CommitIo = PosixCommitIo): UpsertReport =
    mergeDocs(spark, outDir, updates, nBuckets, waveSize, crashAfterWaves, io,
      toBranch = None)

  /** [[upsertDocs]] committed to a BRANCH instead of main — the write-audit-publish
    * staging op. Same MERGE semantics and crash-heal idempotency, but main is
    * bit-for-bit untouched: the base manifest is the branch head's, every rewritten
    * bucket lands at a FRESH generation (`gen * nBuckets + base` — the
    * compaction/stream composite-id space, reserved through the same sidecar ledger
    * so a concurrent stream batch or compaction can never allocate into it), the
    * wave publishes history versions WITHOUT the HEAD swap, and the branch pointer
    * advances only after the last wave (a crashed merge leaves the pointer — and
    * main — where they were; re-running heals at a new generation, and the
    * abandoned partial generation is an unreferenced orphan for [[vacuum]]).
    * Audit the staged result with [[readCommittedAtBranch]] / [[verifySnapshot]],
    * then publish with [[fastForward]]. */
  def upsertDocsToBranch(
      spark: SparkSession,
      outDir: String,
      name: String,
      updates: DataFrame,
      nBuckets: Int = DefaultBuckets,
      waveSize: Int = 4,
      crashAfterWaves: Int = Int.MaxValue,
      io: CommitIo = PosixCommitIo): UpsertReport =
    mergeDocs(spark, outDir, updates, nBuckets, waveSize, crashAfterWaves, io,
      toBranch = Some(name))

  private def mergeDocs(
      spark: SparkSession,
      outDir: String,
      updates: DataFrame,
      nBuckets: Int,
      waveSize: Int,
      crashAfterWaves: Int,
      io: CommitIo,
      toBranch: Option[String]): UpsertReport = {
    val out = Paths.get(outDir)
    val baseVersion = toBranch.map(resolveBranch(outDir, _))
    val existing = baseVersion match {
      case Some(v) => readManifestAt(spark, outDir, v)
      case None => readManifest(spark, outDir)
    }
    require(existing.nonEmpty, s"no committed snapshot under $outDir")
    require(existing.map(_.bucket % nBuckets).distinct.size == existing.size,
      "manifest is not canonical (multiple generations per base bucket — an " +
        "un-compacted stream): run compact() first, a document's rows may " +
        "straddle generations")
    val committedCols = baseVersion
      .map(readCommittedAt(spark, outDir, _))
      .getOrElse(readCommitted(spark, outDir))
      .drop("bucket").columns
    require(updates.columns.sorted.sameElements(committedCols.sorted),
      s"updates schema ${updates.columns.sorted.mkString("(", ",", ")")} must match " +
        s"the committed table ${committedCols.sorted.mkString("(", ",", ")")}")
    require(!updates.columns.contains("bucket"), "updates must not carry `bucket`")
    val idOfBase = existing.map(e => (e.bucket % nBuckets) -> e.bucket).toMap

    // ONE distributed job discovers the affected buckets; only <= nBuckets bucket
    // ids reach the driver. A NULL doc_id in the updates has no bucket to route to
    // — refuse loudly (the committed table tolerates null-id bystanders, but an
    // UPSERT row without an identity is undefined).
    val baseCol = bucketOf(col("doc_id"), nBuckets).cast("long")
    val affectedBases = updates
      .select(when(col("doc_id").isNull, lit(-1L)).otherwise(baseCol).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq.sorted
    require(!affectedBases.contains(-1L),
      "updates contain NULL doc_id rows — an upsert row needs an identity")
    affectedBases.foreach(b => require(idOfBase.contains(b),
      s"update routes to base bucket $b but the manifest has no entry for it — " +
        s"wrong nBuckets for this snapshot?"))

    // BRANCH mode: reserve one fresh generation for every bucket this merge
    // rewrites — through the stream sidecar's ledger (negative key: real batchIds
    // are >= 0) so a concurrent [[commitStreamBatch]] allocation or [[compact]]
    // sees the reservation and allocates above it. Main's dirs are never touched.
    val gen: Long = toBranch match {
      case None => -1L
      case Some(_) if affectedBases.isEmpty => -1L
      case Some(_) =>
        val recorded = readBatchBases(out)
        val g = (existing.map(_.bucket / nBuckets) ++
          readManifest(spark, outDir).map(_.bucket / nBuckets) ++
          recorded.values.map(_ / nBuckets)).foldLeft(0L)(math.max) + 1
        recordBatchBases(out, io, recorded + (-g -> g * nBuckets))
        g
    }

    var manifest = existing.sortBy(_.bucket)
    var matchedDocs = 0L
    var insertedDocs = 0L
    var replacedRows = 0L
    var upsertRows = 0L
    val rewritten = Seq.newBuilder[Long]
    affectedBases.grouped(waveSize).zipWithIndex.foreach { case (wave, wi) =>
      val t0 = System.nanoTime()
      val oldIds = wave.map(idOfBase)
      val targetIds =
        if (gen >= 0) wave.map(gen * nBuckets + _) else oldIds
      val idCol =
        if (targetIds == wave) baseCol
        else wave.zip(targetIds).foldLeft(lit(-1L)) { case (acc, (b, id)) =>
          when(baseCol === b, lit(id)).otherwise(acc)
        }
      val updW = updates.filter(baseCol.isin(wave.map(_.toInt): _*))
      val updIds = updW.select(col("doc_id")).distinct()
      val entries = oldIds.map(id => manifest.find(_.bucket == id).get)
      val files = entries.flatMap(e =>
        e.files.map(f => bucketDir(out, e.bucket).resolve(f).toString))
      val cur =
        if (files.isEmpty)
          updW.withColumn("bucket", lit(0L)).limit(0)
        else spark.read.option("basePath", out.resolve("data").toString)
          .parquet(files: _*)
          .withColumn("bucket", col("bucket").cast("long"))
      // report counters: two bounded aggregates per wave (rows replaced, docs
      // matched / updated) — the same job class as the metrics re-read
      val curHit = cur.join(updIds, Seq("doc_id"), "left_semi")
        .agg(count(lit(1)), countDistinct(col("doc_id"))).head()
      val updStat = updW
        .agg(count(lit(1)), countDistinct(col("doc_id"))).head()
      replacedRows += curHit.getLong(0)
      matchedDocs += curHit.getLong(1)
      insertedDocs += updStat.getLong(1) - curHit.getLong(1)
      upsertRows += updStat.getLong(0)

      val targetOf = oldIds.zip(targetIds).toMap
      // branch mode re-keys the surviving rows to the fresh generation (a
      // bounded when-chain over the wave's <= waveSize ids; null-id bystanders
      // keep their non-null bucket column, so none are dropped)
      val keptRekeyed =
        if (gen < 0) cur.join(updIds, Seq("doc_id"), "left_anti")
        else {
          val remap = oldIds.zip(targetIds).foldLeft(lit(-1L)) {
            case (acc, (o, t)) =>
              when(col("bucket").cast("long") === o, lit(t)).otherwise(acc)
          }
          cur.join(updIds, Seq("doc_id"), "left_anti")
            .withColumn("bucket", remap)
        }
      val merged = keptRekeyed.unionByName(updW.withColumn("bucket", idCol))
      // prior-rows>0 buckets must not stage empty (same silent-loss refusal as
      // resume); every affected bucket receives >= 1 update row anyway
      val expectNonEmpty = entries.filter(_.rows > 0).map(e => targetOf(e.bucket)).toSet
      val (m2, _) = commitWaveFlat(spark, out, merged, targetIds,
        manifest.filterNot(e => oldIds.contains(e.bucket)), t0,
        expectNonEmpty = expectNonEmpty, io = io,
        layoutCols = rewriteLayout(merged), spanMetrics = hasSpanMetrics(merged),
        headSwap = toBranch.isEmpty)
      manifest = m2
      rewritten ++= targetIds
      if (wi + 1 >= crashAfterWaves) throw new InjectedCrash(wi)
    }
    deleteRecursively(out.resolve("staging"))
    // the branch pointer advances ONLY once every wave committed — a crashed
    // branch merge leaves the pointer (and main) untouched; re-running heals.
    // An empty update set committed nothing: the pointer must not move (the
    // current history tail may be someone else's version entirely).
    if (affectedBases.nonEmpty) toBranch.foreach { name =>
      val refs = branchRefs(outDir)
      val base = refs(name)._2
      writeBranches(out, refs + (name -> (versions(outDir).last, base)), io)
    }
    UpsertReport(matchedDocs, insertedDocs, replacedRows, upsertRows,
      rewritten.result())
  }

  /**
   * Streaming entry point: commit ONE micro-batch of already-extracted flat spans
   * through the SAME wave-commit protocol as the batch sink (staging write ->
   * re-read metrics -> atomic per-bucket publish -> distributed hash -> manifest
   * republish). Manifest/bucket ids are `allocatedGeneration * nBuckets + bucket`
   * (Long arithmetic — no lifetime cap from Int overflow): the generation comes
   * from the sidecar transaction log, NOT batchId itself, so batches and
   * compaction rewrites share one strictly-increasing id space (generation ==
   * batchId for a fresh sequential stream); a RE-DELIVERED batchId (foreachBatch
   * replays the last uncommitted batch after a crash) resolves to its recorded
   * allocation, finds its ids already committed and verifying, and skips them — the
   * streaming form of resume's committed-bucket skip (StreamingExtractSpec). The
   * skip check runs the SAME two verification tiers as the batch [[run]]:
   * names+sizes metadata, then (deepVerify=true, the default) the distributed
   * per-file md5 job — so in-place corruption with preserved sizes re-extracts
   * instead of being silently skipped, on both paths alike (ADVICE r3). Returns the
   * composite ids actually committed.
   */
  def commitStreamBatch(
      flat: DataFrame, outDir: String, batchId: Long,
      nBuckets: Int = DefaultBuckets, deepVerify: Boolean = true,
      io: CommitIo = PosixCommitIo, toBranch: Option[String] = None): Seq[Long] = {
    val spark = flat.sparkSession
    val out = Paths.get(outDir)
    Files.createDirectories(out.resolve("data"))
    // BRANCH mode (streaming write-audit-publish): the batch builds on the BRANCH
    // head's manifest, publishes history without the HEAD swap, and advances the
    // branch pointer — main is untouched until [[fastForward]]. Generation
    // allocation is unchanged (the sidecar ledger is branch-agnostic), so batches,
    // branch merges, and compactions still share one strictly-increasing id space.
    val branchVersion = toBranch.map(resolveBranch(outDir, _))
    // Composite base comes from the sidecar transaction log, NOT batchId*nBuckets:
    // compact() writes its canonical generation at max+1, which is exactly the id
    // range `batchId * nBuckets` would hand the NEXT micro-batch — the skip-verify
    // would then find the compacted generation "already committed" and silently
    // swallow the whole batch. Allocating the next free generation at commit time
    // (and recording batchId -> base so a re-delivered batch reuses its allocation)
    // keeps ids strictly increasing across batches AND compactions. For a fresh
    // sequential stream the allocation degenerates to generation == batchId.
    val recorded = readBatchBases(out)
    val base = recorded.getOrElse(batchId, {
      val maxKnown = (readManifest(spark, outDir).map(_.bucket) ++
        recorded.values.map(_ + nBuckets - 1)).foldLeft(-1L)(math.max)
      val b = if (maxKnown < 0) 0L else ((maxKnown / nBuckets) + 1) * nBuckets
      recordBatchBases(out, io, recorded + (batchId -> b))
      b
    })
    val ids = (base until base + nBuckets)
    val existing = branchVersion match {
      case Some(v) => readManifestAt(spark, outDir, v)
      case None => readManifest(spark, outDir)
    }
    val (valid, _) = verifyEntries(spark, out,
      existing.filter(e => ids.contains(e.bucket)), deepVerify)
    val committed = valid.map(_.bucket).toSet
    // compacted-away ids are ALSO committed state (their rows live on in the
    // canonical generation): a re-delivery arriving after an ill-timed compaction
    // must skip them, or it would duplicate every row and resurrect takedown
    // deletes (see [[readCompactedIds]])
    val compacted = readCompactedIds(out)
    val todo = ids.filterNot(committed).filterNot(compacted)
    if (todo.isEmpty) return Seq.empty
    // drop any stale (failed-verify) entries for the ids being rewritten
    val kept = existing.filterNot(e => todo.contains(e.bucket))
    todo.foreach(b => deleteRecursively(bucketDir(out, b)))
    val withBucket = flat
      .withColumn("bucket", lit(base) + bucketOf(col("doc_id"), nBuckets))
      .filter(col("bucket").isin(todo: _*))
    commitWaveFlat(spark, out, withBucket, todo, kept, System.nanoTime(), io = io,
      headSwap = toBranch.isEmpty)
    toBranch.foreach { name =>
      val refs = branchRefs(outDir)
      val bs = refs(name)._2
      writeBranches(out, refs + (name -> (versions(outDir).last, bs)), io)
    }
    todo
  }

  /**
   * Iceberg-style REWRITE action (compaction): merge a multi-generation manifest —
   * typically the composite ids a long-running stream accumulates
   * ([[commitStreamBatch]]: `batchId * nBuckets + bucket`, thousands of small bucket
   * directories at production batch cadence) — into ONE canonical generation of
   * `nBuckets` buckets at `gen = max(bucket / nBuckets) + 1`.
   *
   * Per wave of base buckets: read ONLY the wave's source bucket directories
   * (pruned — never the whole snapshot per wave), re-key each row to
   * `gen*nBuckets + (bucket % nBuckets)`, and commit through the SAME staged-write ->
   * re-read-metrics -> publish -> distributed-hash -> manifest-republish cycle as
   * every other write ([[commitWaveFlat]]). The new generation's directories are NEW
   * names — nothing is rewritten in place — and the manifest republish is the atomic
   * swap (source entries out, merged entries in). Source directories are deleted only
   * AFTER the swap and a row-count reconciliation against their manifest entries, so
   * a crash at any point leaves a fully readable snapshot; the worst case is orphan
   * directories, which [[vacuum]] removes (and which MUST be removed before
   * [[readBack]], which scans the whole data directory, is trusted again).
   *
   * After compaction the manifest is canonical (one entry per base bucket), so
   * [[run]]'s generation-aware resume can still heal an invalidated bucket from the
   * source corpus at its compacted id — streamed ingest, compaction, and batch
   * resume compose.
   *
   * STREAMS: compact only after the checkpoint has advanced past every drained
   * batch (the [[graft.streaming.StreamingExtract.drainOnceCommitted]]
   * `compactThreshold` hook runs exactly there). The pathological interleave — a
   * batch re-delivered AFTER its composite ids were compacted away (crash between
   * sink commit and checkpoint advance, compaction while the stream is down) — is
   * additionally made safe by the compacted-ids sidecar ([[readCompactedIds]]):
   * every merged-away id is recorded before its bytes are reclaimed, and
   * [[commitStreamBatch]] skips recorded ids on re-delivery, so the replay can
   * neither duplicate rows nor resurrect takedown-deleted documents
   * (StreamingTakedownSpec). The hook discipline remains the right deploy shape;
   * the sidecar is the backstop that turns the scaladoc rule into a guarantee.
   */
  /** `layout`: optional COMPUTED clustering keys for the rewritten files (e.g. a
    * [[graft.operators.Layout.zval]] z-order curve over (lang, offset)). Compaction
    * is THE moment to install a multi-dimensional layout — the data is being
    * rewritten anyway, so the z-clustering is free, and every later scan's min/max
    * file skipping prunes range predicates on BOTH curve dimensions
    * (SnapshotCompactSpec proves the pruning with executed-scan metrics). The keys
    * are shuffle/clustering expressions only; nothing derived is persisted. */
  def compact(
      spark: SparkSession,
      outDir: String,
      nBuckets: Int = DefaultBuckets,
      waveSize: Int = DefaultBuckets,
      deepVerify: Boolean = true,
      io: CommitIo = PosixCommitIo,
      layout: Seq[Column] = Seq.empty): CompactReport = {
    val out = Paths.get(outDir)
    val existing = readManifest(spark, outDir)
    val canonical = existing.map(_.bucket % nBuckets).distinct.size == existing.size
    if (existing.isEmpty || canonical)
      return CompactReport(
        existing.map(_.bucket / nBuckets).maxOption.getOrElse(0L),
        Seq.empty, 0L, 0L, noop = true)
    val (valid, invalid) = verifyEntries(spark, out, existing, deepVerify)
    require(invalid.isEmpty,
      s"refusing to compact: bucket(s) ${invalid.map(_.bucket).sorted} fail " +
        "verification — heal them first (re-deliver the stream batch / re-run the " +
        "batch sink); compacting unverified data would bake corruption into the new " +
        "generation")
    // next free generation over BOTH the manifest and the stream sidecar's
    // allocations — a batch that reserved a base but crashed before committing data
    // must not have its generation stolen by compaction (its re-delivery would then
    // collide with the compacted ids)
    val gen = (existing.map(_.bucket / nBuckets) ++
      readBatchBases(out).values.map(_ / nBuckets)).max + 1
    val dataPath = out.resolve("data")
    val byBase = valid.groupBy(e => e.bucket % nBuckets)
    val bases = byBase.keys.toSeq.sorted
    var manifest = existing.sortBy(_.bucket)
    var totalRows = 0L

    bases.grouped(waveSize).foreach { baseWave =>
      val t0 = System.nanoTime()
      val src = baseWave.flatMap(byBase)
      val srcIds = src.map(_.bucket)
      val targetIds = baseWave.map(gen * nBuckets + _)
      val srcDirs = srcIds.map(bucketDir(out, _)).filter(listDataFiles(_).nonEmpty)
      val manifestLess = manifest.filterNot(e => srcIds.contains(e.bucket))
      val (newManifest, waveRows) =
        if (srcDirs.isEmpty) {
          // every source bucket in this wave is EMPTY (a legal committed state) —
          // nothing to stage or read; publish empty merged directories THROUGH the
          // CommitIo seam (raw local mkdirs would be invisible to a non-POSIX store)
          targetIds.foreach { b =>
            val staged = out.resolve("staging").resolve(s"bucket=$b")
            deleteRecursively(staged)
            Files.createDirectories(staged)
            val dst = bucketDir(out, b)
            deleteRecursively(dst)
            io.publishDir(staged, dst)
          }
          val wallMs = ((System.nanoTime() - t0) / 1e6).toLong
          val entries = targetIds.map(b => ManifestEntry(
            bucket = b, rows = 0L, content_hash = combinedHash(Seq.empty),
            files = Seq.empty, file_sizes = Seq.empty, file_hashes = Seq.empty,
            engine_version = graft.operators.DeterministicOcrEngine.Version,
            n_spans = 0L, n_media = 0L, n_text = 0L, n_err = 0L, ocr_chars = 0L,
            n_words = 0L, conf_sum = 0.0, wall_ms = wallMs))
          val m2 = (manifestLess ++ entries).sortBy(_.bucket)
          writeManifest(out, m2, io)
          (m2, 0L)
        } else {
          // basePath keeps the `bucket` partition column; inferred int for small ids,
          // long once composite stream ids grow — normalize through the long cast
          val merged = spark.read.option("basePath", dataPath.toString)
            .parquet(srcDirs.map(_.toString): _*)
            .withColumn("bucket",
              lit(gen * nBuckets) +
                pmod(col("bucket").cast("long"), lit(nBuckets.toLong)))
          val expectNonEmpty = baseWave
            .filter(b => byBase(b).map(_.rows).sum > 0)
            .map(gen * nBuckets + _).toSet
          commitWaveFlat(spark, out, merged, targetIds, manifestLess, t0,
            expectNonEmpty = expectNonEmpty, io = io,
            layoutCols = rewriteLayout(merged),
            layoutExprs =
              if (layout.isEmpty) None else Some(col("bucket") +: layout),
            spanMetrics = hasSpanMetrics(merged))
        }
      // reconcile BEFORE the GC: if the rewrite lost rows, the merged generation is
      // already live (manifest swapped) but every source byte is still on disk
      val expectRows = src.map(_.rows).sum
      require(waveRows == expectRows,
        s"compaction row mismatch for base buckets $baseWave: staged $waveRows rows " +
          s"but the source manifest entries recorded $expectRows — source " +
          "directories left in place for inspection")
      manifest = newManifest
      totalRows += waveRows
      // record the merged-away ids BEFORE reclaiming their bytes: once the log
      // holds an id, a re-delivered stream batch skips it ([[commitStreamBatch]]);
      // a crash between the record and the GC leaves orphan dirs for [[vacuum]]
      recordCompactedIds(out, io, readCompactedIds(out) ++ srcIds)
      srcIds.foreach(b => deleteRecursively(bucketDir(out, b)))
    }
    deleteRecursively(out.resolve("staging"))
    CompactReport(gen, bases, valid.size.toLong, totalRows, noop = false)
  }

  /** Delete `bucket=*` data directories not referenced by the manifest — orphans left
    * by a crash between a compaction wave's manifest swap and its source-directory GC
    * (or by any abandoned write). The manifest is the source of truth (Iceberg
    * semantics), but [[readBack]] scans the whole data directory, so orphans must be
    * vacuumed after a crashed compaction before readBack is trusted again. Returns
    * the removed directory names. */
  def vacuum(spark: SparkSession, outDir: String): Seq[String] = {
    val out = Paths.get(outDir)
    // referenced = HEAD plus every live BRANCH head: a branch is a writable line
    // of development, so its exclusive generations are live bytes, not orphans
    // (tags deliberately do NOT pin bytes — they pin metadata against expiration
    // only, and a tag over reclaimed data fails loudly at read, by contract)
    val referenced = (readManifest(spark, outDir) ++
      branches(outDir).values.toSeq.distinct
        .flatMap(v => readManifestAt(spark, outDir, v)))
      .map(_.bucket).toSet
    val orphans = listPartitionDirs(out.resolve("data")).filter { p =>
      p.getFileName.toString.stripPrefix("bucket=").toLongOption
        .forall(!referenced(_))
    }
    orphans.foreach(deleteRecursively)
    deleteRecursively(out.resolve("staging"))
    orphans.map(_.getFileName.toString)
  }

  /** The two verification tiers shared by batch [[run]] and [[commitStreamBatch]]:
    * tier 1 = driver-side names+sizes metadata ([[fastVerify]]); tier 2 (deep) =
    * ONE batched distributed job re-hashing every tier-1-passing bucket's bytes and
    * comparing per-file md5s + the combined digest. Returns (valid, invalid). */
  private[sources] def verifyEntries(
      spark: SparkSession, out: Path, entries: Seq[ManifestEntry],
      deepVerify: Boolean): (Seq[ManifestEntry], Seq[ManifestEntry]) = {
    val (fastOk, fastBad) = entries.partition(e => fastVerify(out, e))
    val (valid, deepBad) =
      if (!deepVerify || fastOk.isEmpty) (fastOk, Seq.empty[ManifestEntry])
      else {
        val statsByDir = safeBatchedStats(spark,
          fastOk.map(e => bucketDir(out, e.bucket)).filter(listDataFiles(_).nonEmpty))
        fastOk.partition { e =>
          val stats = statsByDir.getOrElse(s"bucket=${e.bucket}", Seq.empty)
          combinedHash(stats) == e.content_hash &&
            stats.map(s => (s._1, s._3)) == e.files.zip(e.file_hashes)
        }
      }
    (valid, fastBad ++ deepBad)
  }

  // ---- protocol internals -------------------------------------------------------

  /**
   * The shared wave-commit body (batch [[run]] waves AND streaming micro-batches):
   * write `flat` (which must carry the `bucket` ids to commit) to staging with the
   * north rule's range layout, derive lineage metrics by RE-READING the staged
   * parquet, atomically publish each bucket, hash the wave's files in one
   * distributed job, and republish the manifest. Returns (updated manifest, rows
   * committed this wave).
   */
  /** Per-bucket lineage metrics recorded in a wave commit. Extraction waves fill all
    * fields from [[SpanMetricsAgg]]; generic table commits ([[TableSnapshot]]) carry
    * row counts only, zeros elsewhere — one manifest format for both. */
  private[sources] final case class WaveMetrics(
      rows: Long, nMedia: Long = 0L, nText: Long = 0L, nErr: Long = 0L,
      ocrChars: Long = 0L, nWords: Long = 0L, confSum: Double = 0.0)

  private[sources] def commitWaveFlat(
      spark: SparkSession,
      out: Path,
      flat: DataFrame,
      wave: Seq[Long],
      manifest0: Seq[ManifestEntry],
      t0: Long,
      expectNonEmpty: Set[Long] = Set.empty,
      io: CommitIo = PosixCommitIo,
      layoutCols: Seq[String] = Seq("bucket", "doc_id", "offset"),
      layoutExprs: Option[Seq[Column]] = None,
      spanMetrics: Boolean = true,
      headSwap: Boolean = true): (Seq[ManifestEntry], Long) = {
    val dataDir = out.resolve("data")
    val staging = out.resolve("staging")
    deleteRecursively(staging)

    // Range repartitioning on (bucket, doc_id, offset) — the north rule's explicit
    // layout: each output task covers a contiguous doc_id range (data files arrive
    // sorted, so resume-time doc_id range predicates prune at file granularity),
    // file sizes balance by sampled distribution, and the trailing `offset` key
    // splits a pathological multi-page document across tasks instead of pinning
    // its whole span set to one writer (the write-side form of salting).
    // `layoutExprs` overrides with COMPUTED layout keys (a z-order curve from
    // [[compact]]'s layout parameter): the expression is a shuffle key only —
    // nothing derived is persisted into the data files.
    flat.repartitionByRange(layoutExprs.getOrElse(layoutCols.map(col)): _*)
      .write.partitionBy("bucket").mode("overwrite").parquet(staging.toString)

    // verify + lineage by re-reading what was written (write-path corruption
    // surfaces here, not at some later consumer). An all-empty wave writes no
    // partition dirs at all (Spark emits only _SUCCESS) — re-reading would throw
    // schema-inference errors, so record zero-metrics entries instead: an empty
    // bucket is a legal committed state (resume of an empty bucket, re-delivered
    // stream batch whose rows all verified elsewhere).
    val metrics: Map[Long, WaveMetrics] =
      if (listPartitionDirs(staging).isEmpty) Map.empty
      else {
        // partition-column type is INFERRED from the directory names (int for small
        // batch ids, long once composite stream ids grow) — normalize to long
        val staged = spark.read.parquet(staging.toString)
        if (spanMetrics)
          staged
            .groupBy(col("bucket").cast("long").as("bucket"))
            .agg(SpanMetricsAgg.spanMetrics(
              col("kind"), col("ok"), col("error"), col("text"),
              col("n_words"), col("conf_sum")).as("m"))
            .select(col("bucket"), col("m.*"))
            .collect()
            .map(r => r.getLong(0) -> WaveMetrics(
              rows = r.getLong(1), nMedia = r.getLong(2), nText = r.getLong(3),
              nErr = r.getLong(4), ocrChars = r.getLong(5), nWords = r.getLong(6),
              confSum = r.getDouble(7))).toMap
        else
          staged
            .groupBy(col("bucket").cast("long").as("bucket"))
            .agg(count(lit(1)).as("rows"))
            .collect()
            .map(r => r.getLong(0) -> WaveMetrics(rows = r.getLong(1))).toMap
      }
    // Stray-bucket gate: every staged bucket id must belong to the committing
    // wave. flat's `bucket` is recomputed from doc_id here, so if the INPUT's
    // bucket column (which selected the wave's documents) disagrees with
    // bucketOf(doc_id, nBuckets), rows land outside `wave`, would never be
    // published, and the snapshot would silently lose them — abort loudly first.
    val stray = metrics.keySet -- wave.toSet
    require(stray.isEmpty,
      s"staged bucket ids $stray fall outside the committing wave $wave — the " +
        "input's `bucket` column disagrees with bucketOf(doc_id, nBuckets)")
    // Refuse the silent-loss shape BEFORE anything publishes: a re-extracted bucket
    // whose prior manifest entry had rows > 0 staging ZERO rows means the resume
    // filter selected nothing — a wrong (but in-range) input bucket column, or the
    // input shrank under the snapshot. Either way committing "empty" destroys
    // previously-committed data. Operators who truly mean it delete the manifest
    // entry first (forcing the initial-commit agreement scan on the next run).
    val vanished = expectNonEmpty -- metrics.keySet
    require(vanished.isEmpty,
      s"resume staged ZERO rows for bucket(s) ${vanished.toSeq.sorted} whose prior " +
        "manifest entries recorded rows > 0 — refusing to overwrite committed data " +
        "with empty buckets (wrong input `bucket` column, or input changed under " +
        "the snapshot; delete the manifest entry to force a rebuild)")
    val wallMs = ((System.nanoTime() - t0) / 1e6).toLong

    // per-bucket publish + manifest republish, through the CommitIo seam. For an
    // IN-PLACE rewrite (heal, deleteDocs/deleteIds, compact re-key) the live
    // destination is first MOVED ASIDE to a `.replaced` sibling, not deleted: a
    // crash between the move and the publish then leaves the pre-image on disk for
    // recovery instead of neither version (POSIX offers no atomic directory swap —
    // the manifest republish below is the real commit point; on object stores the
    // metadata-pointer swap IS the whole story, see [[CommitIo]]). The trash dir is
    // removed after a successful publish, and [[vacuum]] sweeps any crash leftovers.
    wave.foreach { b =>
      val src = staging.resolve(s"bucket=$b")
      val dst = dataDir.resolve(s"bucket=$b")
      // outside data/: partition discovery (readBack) must never see the pre-image
      val trash = dataDir.resolveSibling("trash").resolve(s"bucket=$b")
      if (Files.exists(dst)) {
        deleteRecursively(trash)
        Files.createDirectories(trash.getParent)
        Files.move(dst, trash)
      }
      if (!Files.exists(src)) Files.createDirectories(src) // empty bucket
      io.publishDir(src, dst)
      deleteRecursively(trash)
    }
    deleteRecursively(dataDir.resolveSibling("trash"))
    // per-file (name, size, md5) for the WHOLE wave in one distributed job —
    // executors hash, the driver records digests only (VERDICT r1: no driver-side
    // Files.readAllBytes, and O(1) jobs per wave, not O(buckets))
    val waveStats = batchedFileStats(spark,
      wave.map(b => dataDir.resolve(s"bucket=$b")).filter(listDataFiles(_).nonEmpty))
    var manifest = manifest0
    var waveRows = 0L
    wave.foreach { b =>
      val stats = waveStats.getOrElse(s"bucket=$b", Seq.empty)
      val m = metrics.getOrElse(b, WaveMetrics(rows = 0L))
      manifest = (manifest :+ ManifestEntry(
        bucket = b,
        rows = m.rows,
        content_hash = combinedHash(stats),
        files = stats.map(_._1),
        file_sizes = stats.map(_._2),
        file_hashes = stats.map(_._3),
        engine_version = graft.operators.DeterministicOcrEngine.Version,
        n_spans = m.rows,
        n_media = m.nMedia,
        n_text = m.nText,
        n_err = m.nErr,
        ocr_chars = m.ocrChars,
        n_words = m.nWords,
        conf_sum = m.confSum,
        wall_ms = wallMs)).sortBy(_.bucket)
      waveRows += m.rows
    }
    writeManifest(out, manifest, io, headSwap)
    (manifest, waveRows)
  }

  private[sources] def bucketDir(out: Path, bucket: Long): Path =
    out.resolve("data").resolve(s"bucket=$bucket")

  /**
   * Verification tier 1: names + sizes — pure filesystem METADATA, O(files), driver
   * side, no byte reads. Tier 2 (deep, see run()) recomputes per-file md5s in ONE
   * batched distributed binaryFile job over all tier-1-passing buckets and compares
   * against the recorded `file_hashes` — catches same-size in-place corruption. At
   * 100 TB a resume that trusts the manifest runs with deepVerify=false (Iceberg
   * semantics: the manifest is the source of truth); deep=true re-proves every
   * committed byte without ever pulling data through the driver.
   */
  private def fastVerify(out: Path, e: ManifestEntry): Boolean = {
    // Manifests from an older format version read back with null parallel arrays
    // (Spark's JSON source yields null for absent fields): a null or length-skewed
    // array set is a FAILED verification — the bucket is invalidated and rebuilt —
    // never an NPE that kills the advertised resume path (ADVICE r2).
    val arraysOk = e.files != null && e.file_sizes != null && e.file_hashes != null &&
      e.files.size == e.file_sizes.size && e.files.size == e.file_hashes.size
    val dir = bucketDir(out, e.bucket)
    arraysOk && Files.isDirectory(dir) &&
      listDataFiles(dir).map(p => (p.getFileName.toString, Files.size(p))) ==
        e.files.zip(e.file_sizes)
  }

  /** Per-file (name, size, md5) for MANY bucket directories in one Spark job over the
    * `binaryFile` source — byte-streaming and hashing happen on executors; only
    * (name, size, digest) rows reach the driver. Keyed by directory path string. */
  private def batchedFileStats(
      spark: SparkSession, dirs: Seq[Path]): Map[String, Seq[(String, Long, String)]] = {
    if (dirs.isEmpty) return Map.empty
    spark.read.format("binaryFile").load(dirs.map(_.toString): _*)
      .select(col("path"), col("length"), md5(col("content")).as("h"))
      .collect()
      .map { r =>
        val p = r.getString(0)
        val slash = p.lastIndexOf('/')
        val dir = p.substring(0, slash)
        // key by the final path segment ("bucket=N") — URI scheme formatting varies
        // between Hadoop versions; the bucket segment is unique within one call
        (dir.substring(dir.lastIndexOf('/') + 1),
          (p.substring(slash + 1), r.getLong(1), r.getString(2)))
      }
      .filterNot(f => f._2._1.startsWith(".") || f._2._1.startsWith("_"))
      .groupBy(_._1)
      .map { case (d, rows) => d -> rows.map(_._2).sortBy(_._1).toSeq }
  }

  /** [[batchedFileStats]] with corruption isolation: local-FS checksum sidecars make
    * Hadoop throw on in-place corruption before our digest ever differs, which would
    * fail the whole batched job — fall back to per-directory jobs so only the corrupt
    * bucket goes missing from the result (and thereby fails its verify). */
  private def safeBatchedStats(
      spark: SparkSession, dirs: Seq[Path]): Map[String, Seq[(String, Long, String)]] =
    try batchedFileStats(spark, dirs)
    catch {
      case _: Exception =>
        // Per-directory isolation, with one retry per directory: a transient
        // executor/FS hiccup must not masquerade as corruption — missing stats
        // mean failed-verify, which DELETES and re-extracts the bucket.
        def oneDir(d: Path): Option[(String, Seq[(String, Long, String)])] = {
          def attempt() = batchedFileStats(spark, Seq(d)).headOption
          try attempt()
          catch {
            case _: Exception =>
              try attempt() catch { case _: Exception => None }
          }
        }
        val perDir = dirs.map(d => d -> oneDir(d))
        val expected = dirs.count(listDataFiles(_).nonEmpty)
        val got = perDir.count(_._2.nonEmpty)
        // every non-empty directory failing twice is an infrastructure outage, not
        // per-bucket corruption — abort LOUDLY rather than silently invalidating
        // (and re-extracting) the entire committed snapshot
        require(expected <= 1 || got > 0,
          s"deep verify failed for every one of $expected non-empty bucket " +
            "directories (twice each) — treating this as an infrastructure " +
            "failure and aborting, not as corruption of the whole snapshot")
        perDir.flatMap(_._2).toMap
    }

  /** Range layout + metrics capability for a REWRITE of committed rows (deleteDocs,
    * deleteIds, compact re-key) — shared so the three rewrite sites cannot drift. */
  private[sources] def rewriteLayout(df: DataFrame): Seq[String] =
    if (df.columns.contains("doc_id") && df.columns.contains("offset"))
      Seq("bucket", "doc_id", "offset")
    else "bucket" +: df.columns.find(_ != "bucket").toSeq

  private[sources] def hasSpanMetrics(df: DataFrame): Boolean =
    Seq("kind", "ok", "error", "text", "n_words", "conf_sum")
      .forall(df.columns.contains)

  /** md5 over the sorted "name:size:md5" lines — one digest per bucket. */
  private def combinedHash(stats: Seq[(String, Long, String)]): String = {
    val md = MessageDigest.getInstance("MD5")
    stats.foreach { case (n, sz, h) => md.update(s"$n:$sz:$h\n".getBytes("UTF-8")) }
    hex(md.digest())
  }

  /** The `bucket=N` partition directories under a staging root (empty wave =>
    * none: Spark writes only _SUCCESS for empty partitioned output). */
  private def listPartitionDirs(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala.toSeq
        .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("bucket="))
      finally stream.close()
    }

  private def listDataFiles(dir: Path): Seq[Path] =
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      val stream = Files.list(dir)
      try stream.iterator().asScala.toSeq
        .filter(p => Files.isRegularFile(p))
        .filterNot(p => p.getFileName.toString.startsWith(".")
          || p.getFileName.toString.startsWith("_"))
        .sortBy(_.getFileName.toString)
      finally stream.close()
    }

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** Publish the manifest: serialize all entries as JSON Lines to a temp file in the
    * same directory, then swap it in through the [[CommitIo]] seam (atomic rename on
    * POSIX/HDFS; on an object store this republish IS the metadata-pointer swap —
    * see [[CommitIo]]'s scaladoc).
    *
    * The IMMUTABLE history copy (`manifest-v%06d.json`, the time-travel sequence) is
    * published FIRST, the HEAD swap second: a crash between the two leaves an extra
    * unreferenced history file (harmless; the next publish just takes the next
    * number), never a HEAD whose version is missing from history. */
  private def writeManifest(out: Path, entries: Seq[ManifestEntry],
      io: CommitIo = PosixCommitIo, headSwap: Boolean = true): Long = {
    val body = entries.map(jsonOf).mkString("", "\n", "\n")
    val v = versions(out.toString).lastOption.getOrElse(0L) + 1
    val tmpV = Files.createTempFile(out, ".manifest", ".tmp")
    Files.writeString(tmpV, body)
    io.publishFile(tmpV, versionPath(out, v))
    // a BRANCH commit publishes history only — HEAD (main) must not move
    if (headSwap) {
      val tmp = Files.createTempFile(out, ".manifest", ".tmp")
      Files.writeString(tmp, body)
      io.publishFile(tmp, out.resolve("manifest.json"))
    }
    v
  }

  private def jsonOf(e: ManifestEntry): String = {
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"bucket":${e.bucket},"rows":${e.rows},"content_hash":${q(e.content_hash)},""" +
      s""""files":[${e.files.map(q).mkString(",")}],""" +
      s""""file_sizes":[${e.file_sizes.mkString(",")}],""" +
      s""""file_hashes":[${e.file_hashes.map(q).mkString(",")}],""" +
      s""""engine_version":${q(e.engine_version)},"n_spans":${e.n_spans},""" +
      s""""n_media":${e.n_media},"n_text":${e.n_text},"n_err":${e.n_err},""" +
      s""""ocr_chars":${e.ocr_chars},"n_words":${e.n_words},""" +
      s""""conf_sum":${e.conf_sum},"wall_ms":${e.wall_ms}}"""
  }

  private[graft] def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val stream = Files.walk(p)
      try stream.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally stream.close()
    }
}
