package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.file.{Files, Paths}
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.sources.{LanguagePack, SnapshotSink}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaTest form of the reference's mocked download tests
  * (tests/test_languages.py:9-53): idempotent skip on matching hash, hash-mismatch
  * IOException with temp cleanup, atomic publish, zip extraction. */
class LanguagePackSpec extends AnyFunSuite {

  private def tmp(tag: String): String = {
    val p = Paths.get(sys.props("java.io.tmpdir"), s"graft-lp-$tag")
    SnapshotSink.deleteRecursively(p)
    p.toString
  }

  private val payload = ("eng traineddata bytes " * 3000).getBytes("UTF-8")
  private def src() = new ByteArrayInputStream(payload)
  private val goodMd5 = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(payload).map(b => f"${b & 0xff}%02x").mkString
  }

  test("install streams, verifies, atomically publishes; re-install skips (idempotent)") {
    val dest = tmp("install")
    val f = LanguagePack.install(() => src(), dest, "eng.traineddata", Some(goodMd5))
    assert(Files.readAllBytes(f).toSeq === payload.toSeq)
    assert(LanguagePack.md5OfFile(f) === goodMd5)

    // idempotent skip: a second install with matching hash must not re-read the source
    var pulled = false
    LanguagePack.install(() => { pulled = true; src() }, dest, "eng.traineddata",
      Some(goodMd5))
    assert(!pulled, "matching-hash re-install must skip the transfer (languages.py:135-145)")
    // but WITHOUT a hash and file present it also skips (reference behavior)
    LanguagePack.install(() => { pulled = true; src() }, dest, "eng.traineddata", None)
    assert(!pulled)
    // no temp litter: destination holds exactly the published file
    import scala.jdk.CollectionConverters._
    assert(Files.list(Paths.get(dest)).iterator().asScala
      .map(_.getFileName.toString).toSeq === Seq("eng.traineddata"))
  }

  test("progress callback fires per block on a multi-block transfer (languages.py:154-166)") {
    val dest = tmp("progress")
    val calls = scala.collection.mutable.ArrayBuffer.empty[(Long, Option[Long])]
    LanguagePack.install(() => src(), dest, "eng.traineddata", Some(goodMd5),
      onProgress = (done, total) => calls += ((done, total)),
      totalBytes = Some(payload.length.toLong),
      progressIntervalMs = 0L) // every block, deterministic
    // payload spans ceil(66000/16384) = 5 blocks -> 5 mid-transfer reports + 1 final
    val expectedBlocks = (payload.length + LanguagePack.BlockSize - 1) / LanguagePack.BlockSize
    assert(calls.size === expectedBlocks + 1)
    assert(calls.map(_._1).toSeq === calls.map(_._1).toSeq.sorted, "byte counts regressed")
    assert(calls.last._1 === payload.length.toLong)
    assert(calls.forall(_._2.contains(payload.length.toLong)),
      "declared total must flow through to the observer (the 'x of y' in the reference)")

    // default cadence (500 ms) on an instant in-memory transfer: only the final report
    val dest2 = tmp("progress2")
    var n = 0
    LanguagePack.install(() => src(), dest2, "eng.traineddata", Some(goodMd5),
      onProgress = (_, _) => n += 1)
    assert(n === 1, "throttled cadence must not spam per block")
  }

  test("hash mismatch => IOException('File does not match expected hash'), temp removed") {
    val dest = tmp("badhash")
    val ex = intercept[java.io.IOException] {
      LanguagePack.install(() => src(), dest, "eng.traineddata", Some("0" * 32))
    }
    assert(ex.getMessage === "File does not match expected hash")
    assert(!Files.exists(Paths.get(dest, "eng.traineddata")))
    import scala.jdk.CollectionConverters._
    assert(Files.list(Paths.get(dest)).iterator().asScala.isEmpty, "temp file leaked")
  }

  test("installPack extracts every archive entry; zip-slip entries are rejected") {
    val dest = tmp("pack")
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    Seq("tessdata/eng.traineddata" -> "ENG", "tessdata/osd.traineddata" -> "OSD")
      .foreach { case (n, c) =>
        z.putNextEntry(new ZipEntry(n)); z.write(c.getBytes); z.closeEntry()
      }
    z.close()
    val zipBytes = bos.toByteArray

    val entries = LanguagePack.installPack(
      () => new ByteArrayInputStream(zipBytes), dest, "tessdata.zip", None)
    assert(entries.sorted === Seq("tessdata/eng.traineddata", "tessdata/osd.traineddata"))
    assert(Files.readString(Paths.get(dest, "tessdata", "eng.traineddata")) === "ENG")

    val evil = new ByteArrayOutputStream()
    val z2 = new ZipOutputStream(evil)
    z2.putNextEntry(new ZipEntry("../outside.txt")); z2.write("x".getBytes); z2.closeEntry()
    z2.close()
    val ex = intercept[java.io.IOException] {
      LanguagePack.installPack(() => new ByteArrayInputStream(evil.toByteArray),
        tmp("evil"), "evil.zip", None)
    }
    assert(ex.getMessage.startsWith("Blocked zip-slip entry"))
  }
}
