package graft.sources

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Generic committed-TABLE form of the snapshot protocol (VERDICT r3 #4): per-document
 * derived tables — dedup signatures, term frequencies — written and manifested with
 * the SAME staged-write -> re-read -> verify -> atomic-publish -> distributed-hash ->
 * manifest-republish cycle as extraction output ([[SnapshotSink]] internals, reused,
 * with rows-only lineage metrics).
 *
 * Why this exists: the dedup pipeline materialized its signature table with
 * `localCheckpoint` — executor-local, non-replicated blocks that are correct on one
 * machine but turn an executor loss into a job failure at cluster scale, and that
 * leave the signatures outside the lineage story. Committing them here gives (a)
 * durability — a rerun SKIPS verified buckets and reads committed parquet instead of
 * recomputing md5-heavy signatures over the corpus, (b) the same two-tier
 * verification and invalidate->heal resume as extraction, and (c) manifest lineage
 * (row counts, per-file hashes) for every derived table.
 *
 * The input must carry a `bucket` column in [0, nBuckets) — callers derive it from a
 * HASH of the id (never `id % n`: a modulus-sampled input would populate only
 * gcd-compatible residues). STALENESS is the caller's contract: the output directory
 * must be keyed by the identity of the inputs (source fingerprint + algorithm
 * version), exactly like [[Interleave.materializedDocs]] — a reused directory over
 * changed inputs would serve stale rows with a perfectly valid manifest.
 */
object TableSnapshot {

  /** Commit (or resume) `df` into `outDir`; one wave per `waveSize` buckets.
    * Returns the same report shape as the extraction sink. */
  def run(
      df: DataFrame,
      outDir: String,
      nBuckets: Int = SnapshotSink.DefaultBuckets,
      waveSize: Int = SnapshotSink.DefaultBuckets,
      deepVerify: Boolean = true,
      io: CommitIo = PosixCommitIo): SnapshotSink.SnapshotReport = {
    require(df.columns.contains("bucket"), "TableSnapshot input needs a `bucket` column")
    val spark = df.sparkSession
    val out = Paths.get(outDir)
    Files.createDirectories(out.resolve("data"))
    recordSchema(out, df.schema, io)

    val existing = SnapshotSink.readManifest(spark, outDir)
    val (valid, invalid) = SnapshotSink.verifyEntries(spark, out, existing, deepVerify)
    invalid.foreach(e => SnapshotSink.deleteRecursively(
      SnapshotSink.bucketDir(out, e.bucket)))
    val mustBeNonEmpty = invalid.filter(_.rows > 0).map(_.bucket).toSet
    var manifest = valid.sortBy(_.bucket)
    val committed = valid.map(_.bucket).toSet
    val todo = (0L until nBuckets).filterNot(committed)

    val processed = Seq.newBuilder[Long]
    var totalRows = 0L
    todo.grouped(waveSize).foreach { wave =>
      val t0 = System.nanoTime()
      val waveDf = df.filter(col("bucket").isin(wave.map(_.toInt): _*))
      val (newManifest, waveRows) = SnapshotSink.commitWaveFlat(
        spark, out, waveDf, wave, manifest, t0,
        expectNonEmpty = mustBeNonEmpty.intersect(wave.toSet), io = io,
        layoutCols = Seq("bucket") ++ df.columns.find(_ != "bucket").toSeq,
        spanMetrics = false)
      manifest = newManifest
      processed ++= wave
      totalRows += waveRows
    }
    SnapshotSink.deleteRecursively(out.resolve("staging"))
    SnapshotSink.SnapshotReport(processed.result(), valid.map(_.bucket).sorted,
      invalid.map(_.bucket).sorted, totalRows)
  }

  /**
   * TAKEDOWN CASCADE for derived tables: bucket-granular copy-on-write delete of
   * every row whose `idCol` is in `ids`, the [[SnapshotSink.deleteDocs]] analogue
   * for hash-bucketed committed tables. A right-to-be-forgotten delete is not done
   * when the extraction snapshot is clean — the doc's MinHash bands / term rows
   * live on in committed derived tables; this rewrites exactly the buckets that can
   * contain the ids (routed by the SAME `pmod(hash(id), nBuckets)` the writers use,
   * computed by one tiny literal-Dataset job — no table scan), republishes through
   * the same commit cycle, and leaves untouched buckets' bytes untouched.
   *
   * Same heal caveat as extraction takedown: a later invalidate->resume re-derives
   * the bucket FROM ITS SOURCE — cascade order is source corpus first, derived
   * tables second (and fingerprint-keyed derived dirs of a superseded corpus should
   * be dropped wholesale, which their corpus-identity keying makes safe).
   */
  def deleteIds(
      spark: SparkSession,
      outDir: String,
      ids: Seq[Long],
      idCol: String = "doc_id",
      nBuckets: Int = SnapshotSink.DefaultBuckets,
      io: CommitIo = PosixCommitIo): SnapshotSink.DeleteReport = {
    require(ids.nonEmpty, "deleteIds needs at least one id")
    val out = Paths.get(outDir)
    val existing = SnapshotSink.readManifest(spark, outDir)
    require(existing.nonEmpty, s"no committed table under $outDir")
    require(existing.forall(e => e.bucket >= 0 && e.bucket < nBuckets),
      s"manifest buckets outside [0, $nBuckets) — wrong nBuckets for this table?")
    // the routing below hashes LONG ids; Murmur3 hashes Int and Long DIFFERENTLY,
    // so an INT-typed id column would route to the wrong buckets and this would
    // return a success-shaped DeleteReport(0, Nil) while the rows persist — refuse
    val idType = readBack(spark, outDir).schema(idCol).dataType
    require(idType == org.apache.spark.sql.types.LongType,
      s"deleteIds routes buckets via hash(BIGINT); committed `$idCol` is $idType — " +
        "pass ids in the column's own type family (extend deleteIds) or rewrite")

    // route ids -> buckets with the writers' own hash (Spark Murmur3), driver-side
    import spark.implicits._
    val affectedBuckets = ids.toDS()
      .select(pmod(hash(col("value")), lit(nBuckets)).cast("long").as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    val affected = existing
      .filter(e => affectedBuckets.contains(e.bucket) && e.rows > 0)
      .map(_.bucket).sorted

    var manifest = existing.sortBy(_.bucket)
    var deleted = 0L
    val rewritten = Seq.newBuilder[Long]
    affected.foreach { b =>
      val entry = manifest.find(_.bucket == b).get
      val files = entry.files.map(f => SnapshotSink.bucketDir(out, b).resolve(f).toString)
      val cur = spark.read.option("basePath", out.resolve("data").toString)
        .parquet(files: _*)
      val matches = cur.filter(col(idCol).isInCollection(ids)).count()
      if (matches > 0) {
        val t0 = System.nanoTime()
        // NULL-id bystanders must survive: NOT(NULL IN (...)) evaluates to NULL,
        // which a bare filter would drop — silent data loss in the rewrite
        val kept = cur.filter(col(idCol).isNull || !col(idCol).isInCollection(ids))
          .withColumn("bucket", lit(b))
        val (m2, _) = SnapshotSink.commitWaveFlat(
          spark, out, kept, Seq(b), manifest.filterNot(_.bucket == b), t0, io = io,
          layoutCols = SnapshotSink.rewriteLayout(kept), spanMetrics = false)
        manifest = m2
        deleted += matches
        rewritten += b
      }
    }
    SnapshotSink.deleteRecursively(out.resolve("staging"))
    SnapshotSink.DeleteReport(deleted, rewritten.result())
  }

  /** Read the committed table back (original schema + bucket partition column).
    * `mergeSchema` unions the per-file schemas, so after an add-column evolution
    * ([[recordSchema]]) buckets committed under an older schema version surface the
    * new columns as NULL — the Iceberg add-column default — without any rewrite. */
  def readBack(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(Paths.get(outDir).resolve("data").toString)

  /** True iff `outDir` holds a FULLY committed table: a manifest covering every
    * bucket in [0, nBuckets) whose entries all pass the metadata verification
    * tier. The skip-construction probe for derived tables whose CONSTRUCTION is
    * itself expensive driver-side work (trained model state): [[runHashBucketed]]
    * can lazily filter an ordinary plan down to invalid buckets, but a codebook
    * frame cannot be built lazily — its construction runs the training — so the
    * caller asks first and only trains when this is false. Metadata tier only, by
    * the same read-path contract as [[runHashBucketed]]'s default. */
  def isCommitted(spark: SparkSession, outDir: String, nBuckets: Int): Boolean = {
    val out = Paths.get(outDir)
    if (!Files.exists(out.resolve("data"))) return false
    val entries = SnapshotSink.readManifest(spark, outDir)
    if (entries.map(_.bucket).toSet != (0L until nBuckets).toSet) return false
    val (_, invalid) = SnapshotSink.verifyEntries(spark, out, entries,
      deepVerify = false)
    invalid.isEmpty
  }

  /** The shared derived-table commit shape (dedup signatures, window hashes, tf):
    * hash-bucket `df` on `keyCol`, commit under the snapshot protocol, read back
    * without the bucket column. Single-sourced so the contract — bucket key is
    * HASH-derived, never `key % n` (a modulus-sampled input would populate only
    * gcd residues); metadata-tier verification by default on read paths with the
    * deep hash as the explicit audit knob — cannot drift between the callers. */
  def runHashBucketed(df: DataFrame, keyCol: String, outDir: String, nBuckets: Int,
      deepVerify: Boolean = false): DataFrame = {
    val withBucket =
      df.withColumn("bucket", pmod(hash(col(keyCol)), lit(nBuckets)).cast("int"))
    run(withBucket, outDir, nBuckets, deepVerify = deepVerify)
    readBack(df.sparkSession, outDir).drop("bucket")
  }

  // ---- schema evolution ---------------------------------------------------------
  //
  // Iceberg-style table-level schema history (`schema.json`, JSON lines of
  // {version, ddl}): every commit records the writer's schema; an ADD-COLUMN
  // evolution (all previously-recorded columns still present with identical types —
  // nullability aside, which parquet's reader widens anyway) appends a new version,
  // and old buckets keep their files (new columns read back NULL via mergeSchema).
  // Anything else — dropped column, retyped column — is REFUSED loudly: those need
  // an explicit rewrite (the [[SnapshotSink.compact]]-shaped action), never a silent
  // half-schema table. Resume composes: healing an old bucket under the evolved
  // schema rewrites just that bucket in the new shape, which mergeSchema also reads.

  final case class SchemaVersion(version: Long, ddl: String)

  /** Recorded schema versions, ascending (empty for a pre-evolution table). */
  def schemaHistory(outDir: String): Seq[SchemaVersion] = {
    val p = Paths.get(outDir).resolve("schema.json")
    if (!Files.exists(p)) return Seq.empty
    val Line = """\{"version":(\d+),"ddl":"(.*)"\}""".r
    Files.readAllLines(p).asScala.toSeq.flatMap {
      case Line(v, ddl) => Some(SchemaVersion(v.toLong, ddl.replace("\\\"", "\"")))
      case _ => None
    }
  }

  private def recordSchema(out: Path, schema: StructType, io: CommitIo): Unit = {
    val hist = schemaHistory(out.toString)
    val ddl = schema.toDDL
    if (hist.lastOption.exists(_.ddl == ddl)) return // unchanged — common case
    hist.lastOption.foreach { head =>
      val prev = StructType.fromDDL(head.ddl)
      val cur = schema.fields.map(f => f.name -> f.dataType).toMap
      val broken = prev.fields.filter(f => !cur.get(f.name).contains(f.dataType))
      require(broken.isEmpty,
        s"incompatible schema change for committed table $out: column(s) " +
          broken.map(f => s"${f.name}:${f.dataType.sql}").mkString("[", ", ", "]") +
          " dropped or retyped vs recorded schema version " + head.version +
          " — add-column evolution only; drops/retypes need an explicit rewrite")
    }
    val entries = hist :+ SchemaVersion(hist.lastOption.map(_.version).getOrElse(0L) + 1, ddl)
    val body = entries.map(e =>
      s"""{"version":${e.version},"ddl":"${e.ddl.replace("\"", "\\\"")}"}""")
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(out, ".schema", ".tmp")
    Files.writeString(tmp, body)
    io.publishFile(tmp, out.resolve("schema.json"))
  }
}
