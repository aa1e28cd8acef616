package graft

import graft.media.MediaHeaders
import org.scalatest.funsuite.AnyFunSuite

/** Real-format fixtures built byte-by-byte from the container specs —
  * no codec libraries involved, which is the point: header parsing is
  * plain byte arithmetic and must work on genuine files. */
class MediaHeadersSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("JPEG: SOF0 frame header yields width/height/components") {
    // SOI, APP0 (JFIF, 16 bytes), SOF0 (8-bit, 480x640, 3 comps), SOS-less
    val jfif = bytes(0xff, 0xd8,
      0xff, 0xe0, 0x00, 0x10, 'J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0,
      0xff, 0xc0, 0x00, 0x11, 0x08, 0x01, 0xe0, 0x02, 0x80, 0x03,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1,
      0xff, 0xd9)
    val m = MediaHeaders.parse(jfif).get
    assert(m.format == "jpeg" && m.width == 640 && m.height == 480 && m.channels == 3)
  }

  test("JPEG: progressive SOF2 found after skipped segments; DHT not mistaken for SOF") {
    val prog = bytes(0xff, 0xd8,
      0xff, 0xc4, 0x00, 0x05, 0, 1, 2,             // DHT (0xC4 excluded from SOF range)
      0xff, 0xc2, 0x00, 0x0b, 0x08, 0x00, 0x64, 0x00, 0xc8, 0x01, 0x11, 0, 0,
      0xff, 0xd9)
    val m = MediaHeaders.parse(prog).get
    assert(m.width == 200 && m.height == 100 && m.channels == 1)
  }

  test("JPEG: SOS before any SOF → no metadata (graceful None)") {
    val bad = bytes(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0, 0, 0xff, 0xd9, 0, 0, 0, 0)
    assert(MediaHeaders.parse(bad).isEmpty)
  }

  test("PNG: IHDR big-endian dimensions") {
    val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0x00, 0x00, 0x04, 0x00,   // width 1024
      0x00, 0x00, 0x03, 0x00,   // height 768
      8, 6, 0, 0, 0)
    val m = MediaHeaders.parse(png).get
    assert(m.format == "png" && m.width == 1024 && m.height == 768)
  }

  test("GIF: logical screen descriptor little-endian dimensions") {
    val gif = bytes('G', 'I', 'F', '8', '9', 'a',
      0x40, 0x01,               // width 320
      0xf0, 0x00,               // height 240
      0x91, 0x00, 0x00, 0x00)
    val m = MediaHeaders.parse(gif).get
    assert(m.format == "gif" && m.width == 320 && m.height == 240)
  }

  test("BMP: BITMAPINFOHEADER dims; negative height (top-down) reported absolute") {
    val bmp = bytes('B', 'M', 0, 0, 0, 0, 0, 0, 0, 0, 54, 0, 0, 0,
      40, 0, 0, 0,              // header size 40
      0x80, 0x00, 0x00, 0x00,   // width 128
      0xc0, 0xff, 0xff, 0xff,   // height -64 (top-down)
      1, 0, 24, 0)
    val m = MediaHeaders.parse(bmp).get
    assert(m.format == "bmp" && m.width == 128 && m.height == 64)
  }

  test("WAV: fmt chunk channels/rate, data size → duration") {
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    val fmt = Seq[Int]('f', 'm', 't', ' ') ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(44100) ++ le32(44100 * 4) ++ le16(4) ++ le16(16)
    val data = Seq[Int]('d', 'a', 't', 'a') ++ le32(44100 * 4 * 3) // 3 seconds
    val riff = Seq[Int]('R', 'I', 'F', 'F') ++ le32(36) ++ Seq[Int]('W', 'A', 'V', 'E') ++
      fmt ++ data
    val m = MediaHeaders.parse(bytes(riff: _*)).get
    assert(m.format == "wav" && m.channels == 2 && m.sampleRate == 44100)
    assert(math.abs(m.durationSec - 3.0) < 1e-9)
  }

  test("WAV: truncated fmt chunk (sz < 16) rejected, not read past") {
    def le32(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
    def le16(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)
    // fmt declares only 2 payload bytes; the following data chunk's bytes
    // must NOT be parsed as channels/rate
    val fmt = Seq[Int]('f', 'm', 't', ' ') ++ le32(2) ++ le16(1)
    val data = Seq[Int]('d', 'a', 't', 'a') ++ le32(4) ++ Seq(1, 2, 3, 4)
    val riff = Seq[Int]('R', 'I', 'F', 'F') ++ le32(30) ++ Seq[Int]('W', 'A', 'V', 'E') ++
      fmt ++ data
    assert(MediaHeaders.parse(bytes(riff: _*)).isEmpty)
  }

  private def be16s(v: Int) = Seq((v >> 8) & 0xff, v & 0xff)
  private def be32s(v: Int) = Seq((v >> 24) & 0xff, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)

  /** An ISO-BMFF box: 32-bit big-endian size (8 + payload) + type. */
  private def box(typ: String, payload: Seq[Int]): Seq[Int] =
    be32s(8 + payload.size) ++ typ.map(_.toInt) ++ payload

  test("MP4: ftyp + moov/mvhd + trak/tkhd yields dims and duration (v0 boxes)") {
    val mvhd = box("mvhd", Seq(0, 0, 0, 0) ++   // version 0 + flags
      be32s(0) ++ be32s(0) ++                   // creation, modification
      be32s(600) ++ be32s(3000) ++              // timescale 600, duration 3000 → 5 s
      be32s(0x00010000) ++ be16s(0x0100) ++ Seq.fill(10)(0) ++ // rate, volume, reserved
      Seq.fill(36)(0) ++ Seq.fill(24)(0) ++ be32s(2))
    val tkhdVideo = box("tkhd", Seq(0, 0, 0, 7) ++
      be32s(0) ++ be32s(0) ++ be32s(1) ++ be32s(0) ++ be32s(3000) ++ // c/m/id/res/dur
      Seq.fill(8)(0) ++ Seq.fill(8)(0) ++ Seq.fill(36)(0) ++
      be32s(640 << 16) ++ be32s(360 << 16))     // 16.16 fixed 640x360
    val tkhdAudio = box("tkhd", Seq(0, 0, 0, 7) ++
      be32s(0) ++ be32s(0) ++ be32s(2) ++ be32s(0) ++ be32s(3000) ++
      Seq.fill(8)(0) ++ Seq.fill(8)(0) ++ Seq.fill(36)(0) ++
      be32s(0) ++ be32s(0))                     // audio track: 0x0
    val moov = box("moov", mvhd ++ box("trak", tkhdVideo) ++ box("trak", tkhdAudio))
    val ftyp = box("ftyp", "isom".map(_.toInt) ++ be32s(0x200) ++ "isomiso2".map(_.toInt))
    val m = MediaHeaders.parse(bytes((ftyp ++ moov): _*)).get
    assert(m.format == "mp4" && m.width == 640 && m.height == 360)
    assert(math.abs(m.durationSec - 5.0) < 1e-9)
  }

  test("MP4: version-1 mvhd/tkhd (64-bit fields) parse at their widened offsets") {
    def be64s(v: Long) = be32s((v >> 32).toInt) ++ be32s(v.toInt)
    val mvhd = box("mvhd", Seq(1, 0, 0, 0) ++
      be64s(0L) ++ be64s(0L) ++                 // creation, modification (64-bit)
      be32s(90000) ++ be64s(450000L) ++         // timescale 90000, duration 450000 → 5 s
      be32s(0x00010000) ++ be16s(0x0100) ++ Seq.fill(10)(0) ++ Seq.fill(36)(0) ++
      Seq.fill(24)(0) ++ be32s(2))
    val tkhd = box("tkhd", Seq(1, 0, 0, 7) ++
      be64s(0L) ++ be64s(0L) ++ be32s(1) ++ be32s(0) ++ be64s(450000L) ++
      Seq.fill(8)(0) ++ Seq.fill(8)(0) ++ Seq.fill(36)(0) ++
      be32s(1920 << 16) ++ be32s(1080 << 16))
    val moov = box("moov", mvhd ++ box("trak", tkhd))
    val ftyp = box("ftyp", "isom".map(_.toInt) ++ be32s(0x200))
    val m = MediaHeaders.parse(bytes((ftyp ++ moov): _*)).get
    assert(m.width == 1920 && m.height == 1080)
    assert(math.abs(m.durationSec - 5.0) < 1e-9)
  }

  test("MP4: malformed box size (overruns buffer) and missing mvhd → None") {
    val ftyp = box("ftyp", "isom".map(_.toInt) ++ be32s(0x200))
    // moov declares a size far past the end of the buffer
    val badMoov = be32s(9999) ++ "moov".map(_.toInt) ++ Seq.fill(8)(0)
    assert(MediaHeaders.parse(bytes((ftyp ++ badMoov): _*)).isEmpty)
    // well-formed boxes but no mvhd anywhere → no timescale → None
    val noMvhd = box("moov", box("trak", Seq.fill(12)(0)))
    assert(MediaHeaders.parse(bytes((ftyp ++ noMvhd): _*)).isEmpty)
  }

  test("MP4: empty and truncated mvhd/tkhd boxes → None, never AIOOBE") {
    val ftyp = box("ftyp", "isom".map(_.toInt) ++ be32s(0x200))
    // an EMPTY mvhd (size 8, zero payload) at the very end of the buffer:
    // the version-byte read must be bounds-checked, not throw
    val emptyMvhd = box("moov", box("mvhd", Seq.empty))
    assert(MediaHeaders.parse(bytes((ftyp ++ emptyMvhd): _*)).isEmpty)
    // a truncated v0 mvhd (only the version+flags fit) must not read the
    // NEXT box's bytes as timescale/duration
    val shortMvhd = box("mvhd", Seq(0, 0, 0, 0))
    val decoy = box("free", Seq.fill(24)(0x41))
    assert(MediaHeaders.parse(
      bytes((ftyp ++ box("moov", shortMvhd ++ decoy)): _*)).isEmpty)
    // a well-formed mvhd next to an empty tkhd: the tkhd must fail the
    // parse (totality), not read past its box end
    val mvhd = box("mvhd", Seq(0, 0, 0, 0) ++
      be32s(0) ++ be32s(0) ++ be32s(600) ++ be32s(3000) ++
      be32s(0x00010000) ++ be16s(0x0100) ++ Seq.fill(10)(0) ++
      Seq.fill(36)(0) ++ Seq.fill(24)(0) ++ be32s(2))
    val emptyTkhd = box("trak", box("tkhd", Seq.empty))
    assert(MediaHeaders.parse(
      bytes((ftyp ++ box("moov", mvhd ++ emptyTkhd)): _*)).isEmpty)
  }

  test("unrecognized payloads (the synthetic corpus) parse as None") {
    assert(MediaHeaders.parse("plain text payload, no magic".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(MediaHeaders.parse(null).isEmpty)
  }

  private def le32s(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >> 24) & 0xff)
  private def le16s(v: Int) = Seq(v & 0xff, (v >> 8) & 0xff)

  /** A BITMAPINFOHEADER BMP built byte-by-byte: `rows` are TOP-DOWN
    * (r,g,b) pixel rows, stored bottom-up with 4-byte row padding as
    * the format requires. */
  private def bmp24(rows: Seq[Seq[(Int, Int, Int)]], compression: Int = 0): Array[Byte] = {
    val w = rows.head.size; val h = rows.size
    val rowSize = (24 * w + 31) / 32 * 4
    val px = rows.reverse.flatMap { r =>
      r.flatMap { case (rr, gg, bb) => Seq(bb, gg, rr) } ++
        Seq.fill(rowSize - 3 * w)(0)
    }
    val hdr = Seq[Int]('B', 'M') ++ le32s(54 + px.size) ++ Seq.fill(4)(0) ++ le32s(54) ++
      le32s(40) ++ le32s(w) ++ le32s(h) ++ le16s(1) ++ le16s(24) ++ le32s(compression) ++
      le32s(0) ++ le32s(0) ++ le32s(0) ++ le32s(0) ++ le32s(0)
    bytes((hdr ++ px): _*)
  }

  test("BMP pixel decode: 24-bit BI_RGB luminance stats are exact (incl. row padding)") {
    // top row [red, green], bottom row [blue, white] — BT.601 luminances
    // 76.245 / 149.685 / 29.07 / 255.0 → mean 127.5, min 29.07, max 255
    val img = bmp24(Seq(Seq((255, 0, 0), (0, 255, 0)), Seq((0, 0, 255), (255, 255, 255))))
    val s = MediaHeaders.bmpPixelStats(img).get
    assert(s.n == 4 && math.abs(s.mean - 127.5) < 1e-9)
    assert(math.abs(s.min - 29.07) < 1e-9 && s.max == 255.0)
    // the header parser still types it
    assert(MediaHeaders.parse(img).get.format == "bmp")
  }

  test("BMP pixel decode: 8-bit palette pixels resolve through the palette") {
    // palette: entry 0 = black, entry 1 = white; pixels [0, 1] in one row
    val hdr = Seq[Int]('B', 'M') ++ le32s(66) ++ Seq.fill(4)(0) ++ le32s(62) ++
      le32s(40) ++ le32s(2) ++ le32s(1) ++ le16s(1) ++ le16s(8) ++ le32s(0) ++
      le32s(0) ++ le32s(0) ++ le32s(0) ++ le32s(2) ++ le32s(0) ++
      Seq(0, 0, 0, 0) ++ Seq(255, 255, 255, 0) ++ // BGRA palette quads
      Seq(0, 1, 0, 0) // pixel row + pad to 4
    val s = MediaHeaders.bmpPixelStats(bytes(hdr: _*)).get
    assert(s.n == 2 && s.min == 0.0 && s.max == 255.0 && math.abs(s.mean - 127.5) < 1e-9)
  }

  test("BMP pixel decode: RLE compression and truncated pixel arrays fall back to None") {
    val rle = bmp24(Seq(Seq((1, 2, 3))), compression = 1)
    assert(MediaHeaders.bmpPixelStats(rle).isEmpty, "RLE must stay stubbed")
    val ok = bmp24(Seq(Seq((1, 2, 3), (4, 5, 6))))
    assert(MediaHeaders.bmpPixelStats(ok.take(ok.length - 2)).isEmpty,
      "truncated pixel array must not partially decode")
  }

  test("BMP pixel decode: forged header fields reject as None, never throw") {
    def patched(base: Array[Byte], off: Int, v: Int): Array[Byte] = {
      val b = base.clone()
      le32s(v).zipWithIndex.foreach { case (x, i) => b(off + i) = x.toByte }
      b
    }
    val ok24 = bmp24(Seq(Seq((1, 2, 3), (4, 5, 6))))
    // bfOffBits forged negative (0x80000000) or past the buffer: the
    // pixel loop must never start at a negative index
    assert(MediaHeaders.bmpPixelStats(patched(ok24, 10, 0x80000000)).isEmpty)
    assert(MediaHeaders.bmpPixelStats(patched(ok24, 10, ok24.length + 8)).isEmpty)
    // biWidth huge enough to wrap an Int row stride negative: the
    // truncation guard must still fire (Long math), not pass and AIOOBE
    assert(MediaHeaders.bmpPixelStats(patched(ok24, 18, 0x30000000)).isEmpty)
    // biHeight = Int.MinValue survives math.abs as a negative — must
    // reject, not return a Some(n=0, mean=NaN) poison row
    assert(MediaHeaders.bmpPixelStats(patched(ok24, 22, 0x80000000)).isEmpty)
    // 8-bit palette file with forged biClrUsed: negative count must not
    // throw NegativeArraySizeException; huge count must not attempt a
    // multi-GB allocation before the bounds check
    val hdr8 = Seq[Int]('B', 'M') ++ le32s(66) ++ Seq.fill(4)(0) ++ le32s(62) ++
      le32s(40) ++ le32s(2) ++ le32s(1) ++ le16s(1) ++ le16s(8) ++ le32s(0) ++
      le32s(0) ++ le32s(0) ++ le32s(0) ++ le32s(2) ++ le32s(0) ++
      Seq(0, 0, 0, 0) ++ Seq(255, 255, 255, 0) ++ Seq(0, 1, 0, 0)
    val ok8 = bytes(hdr8: _*)
    assert(MediaHeaders.bmpPixelStats(ok8).nonEmpty, "fixture sanity")
    assert(MediaHeaders.bmpPixelStats(patched(ok8, 46, 0x80000000)).isEmpty)
    assert(MediaHeaders.bmpPixelStats(patched(ok8, 46, 0x7fffffff)).isEmpty)
  }

  /** A PCM WAV with the given samples (16-bit signed LE). */
  private def wav16(samples: Seq[Int]): Array[Byte] = {
    val data = samples.flatMap(v => le16s(v & 0xffff))
    val riff = Seq[Int]('R', 'I', 'F', 'F') ++ le32s(36 + data.size) ++
      Seq[Int]('W', 'A', 'V', 'E') ++
      Seq[Int]('f', 'm', 't', ' ') ++ le32s(16) ++
      le16s(1) ++ le16s(1) ++ le32s(8000) ++ le32s(16000) ++ le16s(2) ++ le16s(16) ++
      Seq[Int]('d', 'a', 't', 'a') ++ le32s(data.size) ++ data
    bytes(riff: _*)
  }

  test("WAV sample decode: 16-bit PCM stats are exact, negatives sign-extended") {
    val s = MediaHeaders.wavSampleStats(wav16(Seq(1000, -2000, 30000, -32768))).get
    assert(s.n == 4 && s.min == -32768.0 && s.max == 30000.0)
    assert(math.abs(s.mean - (-942.0)) < 1e-9)
  }

  test("WAV sample decode: 8-bit PCM is unsigned and centred; non-PCM is None") {
    val data = Seq(0, 128, 255)
    val wav8 = bytes((Seq[Int]('R', 'I', 'F', 'F') ++ le32s(36 + 3) ++
      Seq[Int]('W', 'A', 'V', 'E') ++
      Seq[Int]('f', 'm', 't', ' ') ++ le32s(16) ++
      le16s(1) ++ le16s(1) ++ le32s(8000) ++ le32s(8000) ++ le16s(1) ++ le16s(8) ++
      Seq[Int]('d', 'a', 't', 'a') ++ le32s(3) ++ data ++ Seq(0)): _*)
    val s = MediaHeaders.wavSampleStats(wav8).get
    assert(s.n == 3 && s.min == -128.0 && s.max == 127.0)
    assert(math.abs(s.mean - (-1.0 / 3)) < 1e-9)
    // IEEE-float WAV (audioFormat 3) has no zero-dep decode: stub path
    val float = bytes((Seq[Int]('R', 'I', 'F', 'F') ++ le32s(36) ++
      Seq[Int]('W', 'A', 'V', 'E') ++
      Seq[Int]('f', 'm', 't', ' ') ++ le32s(16) ++
      le16s(3) ++ le16s(1) ++ le32s(8000) ++ le32s(32000) ++ le16s(4) ++ le16s(32) ++
      Seq[Int]('d', 'a', 't', 'a') ++ le32s(0)): _*)
    assert(MediaHeaders.wavSampleStats(float).isEmpty)
  }

  test("mm3's frame stats take the true-decode tier for real BMP/WAV, the stub otherwise") {
    import graft.ops.Multimodal
    val img = bmp24(Seq(Seq((255, 0, 0), (0, 255, 0)), Seq((0, 0, 255), (255, 255, 255))))
    val fi = Multimodal.frameStatsOf(img, "image", 10)
    assert(fi.n == 4 && fi.checksum == 510L) // round(127.5 * 4)
    assert(fi.mean.contains(127.5) && fi.max.contains(255.0))
    val fw = Multimodal.frameStatsOf(wav16(Seq(100, -100, 50, -50)), "audio", 10)
    assert(fw.n == 4 && fw.checksum == 0L && fw.mean.contains(0.0))
    assert(fw.min.contains(-100.0) && fw.max.contains(100.0))
    // a kind-mismatched real blob and a text payload both walk bytes
    val text = "no magic here, synthetic corpus row".getBytes("UTF-8")
    val ft = Multimodal.frameStatsOf(text, "image", 10)
    val expectedN = (text.length + 9) / 10
    assert(ft.mean.isEmpty && ft.n == expectedN)
    val mismatch = Multimodal.frameStatsOf(img, "video", 10)
    assert(mismatch.mean.isEmpty, "a BMP filed under video must not pixel-decode")
  }
}
