package graft.pdf

import java.util.zip.Inflater
import scala.collection.mutable.ArrayBuffer

/** T9 (SURVEY.md §2.9): zero-dependency PDF text extraction.
  *
  * The zero-egress build ships no PDF library, so this implements the
  * minimal subset the reference corpus needs (validated against
  * `/root/reference/data/sedar__...878C2FBC.pdf`, 61 pages / 181 streams):
  *
  *  - stream discovery: scan for `stream` … `endstream` segments;
  *  - FlateDecode via `java.util.zip.Inflater` (the only filter the
  *    corpus uses; non-Flate/image streams simply fail to inflate or
  *    contain no text operators and are skipped);
  *  - text reconstruction: literal strings `(…)` and hex strings `<…>`
  *    (PDF 32000-1 §7.3.4.3: digit pairs, embedded whitespace legal,
  *    odd trailing digit implies 0) feeding the `Tj`/`TJ`/`'`/`"` show
  *    operators, with octal/char escapes; `Td`/`TD`/`T*` emit a space,
  *    `ET` a newline (enough structure for regex-level table
  *    extraction; per-glyph kerning arrays like `[(4.)-2 (1)]TJ`
  *    concatenate correctly).
  *
  * CID/Type0 multi-byte fonts: every ToUnicode CMap stream in the
  * document (`beginbfchar`/`beginbfrange` sections, PDF 32000-1 §9.10.3)
  * is parsed into one merged 2-byte-code → UTF-16 map. A hex show
  * string whose byte count is even and whose 2-byte codes ALL have CMap
  * entries decodes through the map (the CID path); anything else keeps
  * the single-byte Latin-1 reading, so documents without CID fonts —
  * the reference corpus included — are byte-for-byte unchanged.
  *
  * Known limitations (documented per TEST:63): CID codes inside literal
  * `(…)` strings are not mapped (CID generators emit hex strings), and
  * fonts are not resolved per show-op — the merged document-level map
  * stands in for per-font CMaps, which collide only if two fonts assign
  * the same 2-byte code. The UDF signature
  * (`Array[Byte] => Seq[String]`) is the swap point for PDFBox/Tika
  * where dependencies exist.
  */
object PdfText extends Serializable {

  /** Extract per-content-stream text blocks ("pages": the corpus emits
    * one content stream per page). */
  def pages(bytes: Array[Byte]): Seq[String] = {
    val streams = inflatedStreams(bytes)
    val cmap = toUnicodeMap(streams)
    val out = ArrayBuffer.empty[String]
    streams.foreach { cs =>
      if (containsShowOp(cs)) {
        val t = extractText(cs, cmap)
        if (t.exists(!_.isWhitespace)) out += normalize(t)
      }
    }
    out.toSeq
  }

  /** All FlateDecode-able stream bodies, in document order. */
  private def inflatedStreams(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = ArrayBuffer.empty[Array[Byte]]
    var i = 0
    while (i >= 0 && i < bytes.length) {
      val j = indexOf(bytes, "stream", i)
      if (j < 0) { i = -1 }
      else {
        var k = j + 6
        if (k + 1 < bytes.length && bytes(k) == '\r' && bytes(k + 1) == '\n') k += 2
        else if (k < bytes.length && bytes(k) == '\n') k += 1
        val e = indexOf(bytes, "endstream", k)
        if (e < 0) { i = -1 }
        else {
          inflate(bytes, k, e).foreach(out += _)
          i = e + 9
        }
      }
    }
    out.toSeq
  }

  /** Whole-document text (pages joined by form-feed). */
  def text(bytes: Array[Byte]): String = pages(bytes).mkString("")

  private def indexOf(hay: Array[Byte], needle: String, from: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    var i = math.max(from, 0)
    val limit = hay.length - n.length
    while (i <= limit) {
      var j = 0
      while (j < n.length && hay(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  private def inflate(b: Array[Byte], from: Int, to: Int): Option[Array[Byte]] = {
    if (to <= from) return None
    val inf = new Inflater()
    try {
      inf.setInput(b, from, to - from)
      val out = new java.io.ByteArrayOutputStream(math.max(1024, (to - from) * 4))
      val buf = new Array[Byte](16384)
      var n = inf.inflate(buf)
      while (n > 0) { out.write(buf, 0, n); n = inf.inflate(buf) }
      if (out.size() == 0) None else Some(out.toByteArray)
    } catch {
      case _: Exception => None
    } finally inf.end()
  }

  private def containsShowOp(cs: Array[Byte]): Boolean =
    indexOf(cs, "Tj", 0) >= 0 || indexOf(cs, "TJ", 0) >= 0

  private val bfCharBlock = "(?s)beginbfchar(.*?)endbfchar".r
  private val bfRangeBlock = "(?s)beginbfrange(.*?)endbfrange".r
  private val bfCharPair = "<([0-9A-Fa-f]{4})>\\s*<([0-9A-Fa-f]+)>".r
  private val bfRangeLine =
    "(?s)<([0-9A-Fa-f]{4})>\\s*<([0-9A-Fa-f]{4})>\\s*(?:<([0-9A-Fa-f]+)>|\\[(.*?)\\])".r
  private val hexToken = "<([0-9A-Fa-f]+)>".r

  /** dst hex (UTF-16BE code units) → string; generators that emit a
    * short dst (e.g. `<6C>`) get zero-padded to a full code unit. */
  private def utf16Dst(hex: String): String = {
    val h = "0" * ((4 - hex.length % 4) % 4) + hex
    new String(h.grouped(4).map(Integer.parseInt(_, 16).toChar).toArray)
  }

  /** Merged 2-byte-code → unicode map from every ToUnicode CMap stream
    * (identified by its bfchar/bfrange sections). Only 4-hex-digit
    * source codes participate: 1-byte simple-font CMaps must not
    * reinterpret ordinary Latin-1 hex strings. */
  private def toUnicodeMap(streams: Seq[Array[Byte]]): Map[Int, String] = {
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    streams.foreach { cs =>
      if (indexOf(cs, "beginbfchar", 0) >= 0 || indexOf(cs, "beginbfrange", 0) >= 0) {
        val txt = new String(cs, "ISO-8859-1")
        bfCharBlock.findAllMatchIn(txt).foreach { blk =>
          bfCharPair.findAllMatchIn(blk.group(1)).foreach { p =>
            m.getOrElseUpdate(Integer.parseInt(p.group(1), 16), utf16Dst(p.group(2)))
          }
        }
        bfRangeBlock.findAllMatchIn(txt).foreach { blk =>
          bfRangeLine.findAllMatchIn(blk.group(1)).foreach { r =>
            val lo = Integer.parseInt(r.group(1), 16)
            val hi = Integer.parseInt(r.group(2), 16)
            if (r.group(3) != null) {
              // <lo> <hi> <dstStart>: the LAST UTF-16 code unit increments
              val base = utf16Dst(r.group(3)).toCharArray
              var c = lo
              while (c <= hi) {
                val d = base.clone()
                d(d.length - 1) = (d(d.length - 1) + (c - lo)).toChar
                m.getOrElseUpdate(c, new String(d))
                c += 1
              }
            } else {
              // <lo> <hi> [<d1> <d2> …]: one explicit dst per code
              val dsts = hexToken.findAllMatchIn(r.group(4)).map(_.group(1)).toSeq
              dsts.zipWithIndex.foreach { case (d, k) =>
                if (lo + k <= hi) m.getOrElseUpdate(lo + k, utf16Dst(d))
              }
            }
          }
        }
      }
    }
    m.toMap
  }

  /** CID path: an even-byte hex string whose 2-byte codes ALL map
    * decodes through the CMap; any miss keeps the Latin-1 reading. */
  private def decodeCid(raw: String, cmap: Map[Int, String]): String = {
    if (cmap.isEmpty || raw.isEmpty || raw.length % 2 != 0) return raw
    val sb = new StringBuilder
    var i = 0
    while (i < raw.length) {
      val code = (raw.charAt(i) << 8) | raw.charAt(i + 1)
      cmap.get(code) match {
        case Some(u) => sb.append(u)
        case None => return raw
      }
      i += 2
    }
    sb.toString
  }

  /** Tokenize a content stream: literal strings accumulate on a pending
    * stack; show operators flush them to output. */
  private def extractText(cs: Array[Byte], cmap: Map[Int, String]): String = {
    val sb = new StringBuilder
    val pending = new StringBuilder
    var i = 0
    val n = cs.length
    while (i < n) {
      val c = cs(i) & 0xff
      if (c == '(') {
        // literal string with nesting + escapes
        var depth = 1
        var j = i + 1
        val buf = new StringBuilder
        while (j < n && depth > 0) {
          val ch = cs(j) & 0xff
          if (ch == '\\' && j + 1 < n) {
            val e = cs(j + 1) & 0xff
            e match {
              case 'n' => buf.append('\n'); j += 2
              case 'r' => buf.append('\r'); j += 2
              case 't' => buf.append('\t'); j += 2
              case 'b' => buf.append('\b'); j += 2
              case 'f' => buf.append('\f'); j += 2
              case d if d >= '0' && d <= '7' =>
                var oct = 0; var cnt = 0; var k = j + 1
                while (k < n && cnt < 3 && (cs(k) & 0xff) >= '0' && (cs(k) & 0xff) <= '7') {
                  oct = oct * 8 + ((cs(k) & 0xff) - '0'); k += 1; cnt += 1
                }
                buf.append((oct & 0xff).toChar); j = k
              case other => buf.append(other.toChar); j += 2
            }
          } else if (ch == '(') { depth += 1; buf.append('('); j += 1 }
          else if (ch == ')') {
            depth -= 1
            if (depth > 0) buf.append(')')
            j += 1
          } else { buf.append(ch.toChar); j += 1 }
        }
        pending.append(buf)
        i = j
      } else if (c == '<' && i + 1 < n && (cs(i + 1) & 0xff) != '<') {
        // hex string <48656c6c6f>: digit pairs → bytes, whitespace
        // skipped, odd trailing digit implies 0. `<<` (dictionary
        // start, e.g. BDC property lists) is excluded by the guard;
        // a '<' followed by non-hex garbage is left unconsumed.
        var j = i + 1
        var hi = -1
        var ok = true
        val buf = new StringBuilder
        while (ok && j < n && (cs(j) & 0xff) != '>') {
          val ch = cs(j) & 0xff
          val v = Character.digit(ch, 16)
          if (v >= 0) {
            if (hi < 0) hi = v
            else { buf.append(((hi << 4) | v).toChar); hi = -1 }
            j += 1
          } else if (ch == ' ' || ch == '\n' || ch == '\r' || ch == '\t' || ch == '\f' || ch == 0) {
            j += 1
          } else ok = false
        }
        if (ok && j < n) {
          if (hi >= 0) buf.append((hi << 4).toChar)
          pending.append(decodeCid(buf.toString, cmap))
          i = j + 1
        } else i += 1
      } else if (c == 'T' && i + 1 < n && ((cs(i + 1) & 0xff) == 'j' || (cs(i + 1) & 0xff) == 'J')) {
        sb.append(pending).append(' '); pending.setLength(0); i += 2
      } else if (c == '\'' || c == '"') {
        sb.append(pending).append(' '); pending.setLength(0); i += 1
      } else if (c == 'T' && i + 1 < n &&
        ((cs(i + 1) & 0xff) == 'd' || (cs(i + 1) & 0xff) == 'D' || (cs(i + 1) & 0xff) == '*')) {
        sb.append(' '); pending.setLength(0); i += 2
      } else if (c == 'E' && i + 1 < n && (cs(i + 1) & 0xff) == 'T') {
        sb.append('\n'); pending.setLength(0); i += 2
      } else i += 1
    }
    sb.toString
  }

  private def normalize(s: String): String =
    s.replaceAll("[ \\t]+", " ").replaceAll(" ?\\n[ \\n]*", "\n").trim
}
