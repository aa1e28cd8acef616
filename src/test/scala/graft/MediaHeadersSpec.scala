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

  test("unrecognized payloads (the synthetic corpus) parse as None") {
    assert(MediaHeaders.parse("plain text payload, no magic".getBytes("UTF-8")).isEmpty)
    assert(MediaHeaders.parse(Array.emptyByteArray).isEmpty)
    assert(MediaHeaders.parse(null).isEmpty)
  }
}
