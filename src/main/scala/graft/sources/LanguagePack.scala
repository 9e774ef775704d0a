package graft.sources

import java.io.{FileInputStream, FileOutputStream, InputStream}
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.zip.ZipInputStream

/**
 * Language-pack installation, reproducing the reference's download/verify/extract
 * surface (`_download_languague` uiucprescon/ocr/languages.py:130-179,
 * `download_language_pack` :182-198, `_extract_language_pack` :201-205) as a
 * local-source transfer (this sandbox has zero egress; the `fetch` argument stands in
 * for the HTTP stream — the protocol around it is the reference's, step for step):
 *
 *   1. skip-if-present idempotency: existing destination with matching md5 (or no hash
 *      requested) returns immediately (languages.py:135-145);
 *   2. stream in 16 KiB blocks to a temp file IN the destination directory, hashing as
 *      it goes (languages.py:146-163);
 *   3. hash mismatch => IOException("File does not match expected hash"), temp removed
 *      (languages.py:168-169, 176-178);
 *   4. atomic rename temp -> final (languages.py:174-175);
 *   5. zip extraction of every entry into the destination (languages.py:201-205),
 *      with entry-path traversal rejected (engine hardening; the reference extracts
 *      blindly).
 *
 * This same temp+hash+rename protocol, lifted to table commits, is
 * [[SnapshotSink]] — here it is kept at the reference's own granularity so the
 * user-facing language-data API carries over complete.
 */
object LanguagePack {

  val BlockSize: Int = 16 * 1024

  /** Progress observer: (bytesSoFar, totalBytesIfKnown). The reference prints
    * "Downloaded x of y" every 0.5 s during transfer (languages.py:154-166); a
    * multi-GB pack transfer with no observability hook is the first thing a real
    * user hits, so the engine surfaces the same signal as a callback. */
  type ProgressFn = (Long, Option[Long]) => Unit

  /** Mirror of the reference's 0.5 s reporting cadence (languages.py:154). */
  val ProgressIntervalMs: Long = 500L

  /** Transfer `source` (a stream factory) to `destination/baseName` with the
    * reference's idempotency + verify + atomic-rename protocol. Returns the final
    * path. `onProgress` fires at most every `progressIntervalMs` (0 = every block,
    * for deterministic tests) plus once at completion, with the running byte count
    * and the caller-declared total if known — languages.py:154-166 step for step. */
  def install(
      source: () => InputStream,
      destination: String,
      baseName: String,
      md5Hash: Option[String] = None,
      onProgress: ProgressFn = (_, _) => (),
      totalBytes: Option[Long] = None,
      progressIntervalMs: Long = ProgressIntervalMs): Path = {
    val destDir = Paths.get(destination)
    Files.createDirectories(destDir)
    val destFile = destDir.resolve(baseName)

    // step 1: idempotent skip (languages.py:135-145)
    if (Files.exists(destFile)) {
      if (md5Hash.isEmpty || md5OfFile(destFile) == md5Hash.get) return destFile
    }

    // step 2: stream to temp in the SAME directory, hashing chunk-wise
    val temp = Files.createTempFile(destDir, "lp-", ".tmp")
    try {
      val md = MessageDigest.getInstance("MD5")
      val in = source()
      try {
        val out = new FileOutputStream(temp.toFile)
        try {
          val buf = new Array[Byte](BlockSize)
          var total = 0L
          var lastReport = System.nanoTime()
          var n = in.read(buf)
          while (n > 0) {
            out.write(buf, 0, n)
            md.update(buf, 0, n)
            total += n
            // languages.py:154-166 — report at the configured cadence mid-transfer
            val now = System.nanoTime()
            if ((now - lastReport) / 1000000L >= progressIntervalMs) {
              onProgress(total, totalBytes)
              lastReport = now
            }
            n = in.read(buf)
          }
          onProgress(total, totalBytes) // final report: transfer complete
        } finally out.close()
      } finally in.close()

      // step 3: verify (languages.py:168-169)
      val digest = hex(md.digest())
      if (md5Hash.exists(_ != digest))
        throw new java.io.IOException("File does not match expected hash")

      // step 4: atomic publish (languages.py:174-175)
      Files.move(temp, destFile, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      destFile
    } finally {
      Files.deleteIfExists(temp) // languages.py:176-178
    }
  }

  /** Install an archive then extract every entry (download_language_pack shape). */
  def installPack(
      source: () => InputStream,
      destination: String,
      archiveName: String,
      md5Hash: Option[String] = None): Seq[String] = {
    val archive = install(source, destination, archiveName, md5Hash)
    extract(archive, destination)
  }

  /** Extract all zip entries into `destination` (languages.py:201-205), rejecting
    * entries that would escape it. Returns extracted entry names. */
  def extract(archive: Path, destination: String): Seq[String] = {
    val destDir = Paths.get(destination).toAbsolutePath.normalize
    val out = Seq.newBuilder[String]
    val zin = new ZipInputStream(new FileInputStream(archive.toFile))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        val target = destDir.resolve(e.getName).normalize
        if (!target.startsWith(destDir))
          throw new java.io.IOException("Blocked zip-slip entry: " + e.getName)
        if (e.isDirectory) Files.createDirectories(target)
        else {
          Files.createDirectories(target.getParent)
          val fos = new FileOutputStream(target.toFile)
          try {
            val buf = new Array[Byte](BlockSize)
            var n = zin.read(buf)
            while (n > 0) { fos.write(buf, 0, n); n = zin.read(buf) }
          } finally fos.close()
        }
        out += e.getName
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  def md5OfFile(p: Path): String = {
    val md = MessageDigest.getInstance("MD5")
    val in = new FileInputStream(p.toFile)
    try {
      val buf = new Array[Byte](BlockSize)
      var n = in.read(buf)
      while (n > 0) { md.update(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    hex(md.digest())
  }

  private def hex(b: Array[Byte]): String = b.map(x => f"${x & 0xff}%02x").mkString
}
