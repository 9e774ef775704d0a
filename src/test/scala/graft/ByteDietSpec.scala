package graft

import graft.operators.DeterministicOcrEngine.md5Hex
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/**
 * Differential fuzz for the byte-diet rewrites: [[graft.functions.MinHashOps]] and
 * [[graft.functions.SimHashImpl]] walk raw UTF-8 bytes (0x20 token split, unsigned
 * digest comparison, byte-range shingles) — these properties pin them to the plain
 * string formulation they replaced, across multibyte text, empty tokens (consecutive
 * spaces), and leading/trailing separators. A divergence here would silently break
 * DuckDB oracle parity for minhash_bands / neardup_pairs / fingerprint / simhash*.
 */
class ByteDietSpec extends AnyFunSuite {

  /** Deterministic sampling (the scalatest+scalacheck bridge is not in the offline
    * cache, same pattern as ExtractionPropertySpec): 200 seeded samples per property. */
  private def forAll(g: Gen[String])(check: String => Unit): Unit =
    (0 until 200).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(0xb17ed1e7L + i)).foreach(check)
    }

  // ---- reference (string) formulations, as shipped in round 1 -------------------

  private def shingleStrings(text: String, n: Int): Array[String] = {
    val toks = text.split(" ", -1)
    val count = math.max(0, toks.length - n) + 1
    Array.tabulate(count)(i => toks.slice(i, math.min(toks.length, i + n)).mkString(" "))
  }

  private def minhashBandsRef(text: String): Seq[(Int, String)] = {
    val sh = shingleStrings(text, 3)
    val mins = (0 until 8).map(p => sh.map(s => md5Hex(s"$p|$s")).min)
    (0 until 4).map(b => (b, md5Hex(mins(2 * b) + mins(2 * b + 1))))
  }

  private def fingerprintRef(text: String): (String, Long) = {
    val sh = shingleStrings(text, 5)
    (sh.map(md5Hex).min, sh.length.toLong)
  }

  private def simhash64Ref(text: String): Long = {
    val sums = new Array[Int](64)
    text.split(" ", -1).foreach { tok =>
      val h = md5Hex(tok)
      (0 until 64).foreach { k =>
        val dv = graft.operators.DeterministicOcrEngine.hexVal(h.charAt(k / 4))
        sums(k) += 2 * ((dv >> (3 - k % 4)) & 1) - 1
      }
    }
    (0 until 64).foldLeft(0L)((acc, k) => if (sums(k) >= 0) acc | (1L << k) else acc)
  }

  // ---- generator: texts with multibyte chars, runs of spaces, edge shapes -------

  private val token: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.oneOf("日本語", "données", "αβγ", "схема", "🙂x", ""),
    Gen.const("a"))
  private val text: Gen[String] = for {
    toks <- Gen.listOfN(12, token)
    sep <- Gen.oneOf(" ", "  ") // double space => empty token, must survive
    lead <- Gen.oneOf("", " ")
    trail <- Gen.oneOf("", " ")
  } yield lead + toks.mkString(sep) + trail

  test("byte-level minhash bands == string-formulation bands (multibyte + empties)") {
    forAll(text) { s =>
      val got = graft.functions.MinHashOps.minhashBands(UTF8String.fromString(s))
      val rows = (0 until got.numElements()).map { i =>
        val r = got.getStruct(i, 2)
        (r.getInt(0), r.getUTF8String(1).toString)
      }
      assert(rows === minhashBandsRef(s), s"text=<$s>")
    }
  }

  test("byte-level fingerprint == string formulation") {
    forAll(text) { s =>
      val r = graft.functions.MinHashOps.fingerprint(UTF8String.fromString(s))
      assert((r.getUTF8String(0).toString, r.getLong(1)) === fingerprintRef(s),
        s"text=<$s>")
    }
  }

  test("byte-level simhash64 == hex-digit formulation") {
    forAll(text) { s =>
      assert(graft.functions.SimHashImpl.simhash64(UTF8String.fromString(s))
        === simhash64Ref(s), s"text=<$s>")
    }
  }

  test("explicit edges: empty text, all-space, single token") {
    Seq("", " ", "  ", "x", " x", "x ", "日 本 語").foreach { s =>
      assert(graft.functions.SimHashImpl.simhash64(UTF8String.fromString(s))
        === simhash64Ref(s), s"simhash <$s>")
      val r = graft.functions.MinHashOps.fingerprint(UTF8String.fromString(s))
      assert((r.getUTF8String(0).toString, r.getLong(1)) === fingerprintRef(s),
        s"fingerprint <$s>")
    }
  }
}
