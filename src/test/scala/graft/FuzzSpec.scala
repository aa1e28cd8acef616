package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** Property fuzz over the two hand-written binary parsers: whatever the
  * bytes, `MediaHeaders.parse` and `PdfText.pages` must return (Option /
  * Seq), never throw — at 100 TB a single malformed blob that throws
  * kills the whole stage, so total-function behavior IS the scale
  * contract (S9 quarantine catches rows, not executor crashes).
  * Deterministically seeded so failures reproduce. */
class FuzzSpec extends AnyFunSuite {

  private def check(p: Prop, n: Int = 300): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(n)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)),
      p)
    assert(res.passed, res.status.toString)
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("ISO-8859-1")

  // container magics steer the fuzz into the format-specific walkers
  // (pure random bytes almost never pass the signature sniff)
  private val magics: Seq[Array[Byte]] = Seq(
    Array(0xFF, 0xD8, 0xFF).map(_.toByte), // JPEG SOI
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte), // PNG
    ascii("GIF89a"),
    ascii("BM"),
    ascii("RIFF") ++ Array[Byte](16, 0, 0, 0) ++ ascii("WAVE"),
    Array[Byte](0, 0, 0, 24) ++ ascii("ftypisom"), // ISO-BMFF
    ascii("%PDF-1.4") :+ 0x0A.toByte)

  private val junk: Gen[Array[Byte]] =
    Gen.containerOf[Array, Byte](Gen.choose(Byte.MinValue, Byte.MaxValue))

  private val magicJunk: Gen[Array[Byte]] =
    for { m <- Gen.oneOf(magics); tail <- junk } yield m ++ tail

  test("MediaHeaders.parse is total on arbitrary and magic-prefixed bytes") {
    check(Prop.forAll(junk) { b => media.MediaHeaders.parse(b); true })
    check(Prop.forAll(magicJunk) { b => media.MediaHeaders.parse(b); true })
  }

  test("PdfText.pages is total on arbitrary and magic-prefixed bytes") {
    check(Prop.forAll(junk) { b => pdf.PdfText.pages(b); true }, n = 100)
    check(Prop.forAll(magicJunk) { b => pdf.PdfText.pages(b); true }, n = 100)
  }

  test("random truncations and single-byte corruptions of the real PDF never throw") {
    val path = Paths.get(
      "/root/reference/data/sedar__000003116_Aris_Mining_Corporation__technical-report__878C2FBC.pdf")
    assume(Files.exists(path))
    val bytes = Files.readAllBytes(path)
    val rnd = new scala.util.Random(7)
    (1 to 20).foreach { _ =>
      val cut = rnd.nextInt(bytes.length)
      pdf.PdfText.pages(java.util.Arrays.copyOf(bytes, cut)) // must not throw
    }
    (1 to 10).foreach { _ =>
      val mutated = bytes.clone()
      mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      pdf.PdfText.pages(mutated) // must not throw
    }
  }
}
