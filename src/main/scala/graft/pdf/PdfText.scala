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
  * CID/Type0 multi-byte fonts: ToUnicode CMap streams
  * (`beginbfchar`/`beginbfrange` sections, PDF 32000-1 §9.10.3) are
  * parsed into 2-byte-code → UTF-16 maps and resolved PER FONT: the
  * object graph (`N G obj` … `endobj`) is scanned linearly (no xref
  * needed), page objects are linked to their `/Contents` streams and
  * `/Resources` font dicts (inline, indirect, or inherited via the
  * `/Parent` chain; Form XObjects use their own `/Resources`), and the
  * content tokenizer tracks `Tf` so each hex show string decodes
  * through the ACTIVE font's CMap. Resolution order per hex string:
  * active-font CMap (all 2-byte codes map) → document-merged CMap
  * (all codes map) → single-byte Latin-1 — so documents without CID
  * fonts, and documents whose structure this subset cannot link, are
  * byte-for-byte unchanged; two fonts assigning the same 2-byte code
  * different glyphs (the old documented collision) now decode
  * correctly by scope.
  *
  * Literal `(…)` strings under an active CID font decode through that
  * font's CMap as well (all-codes-map gated, strictly font-scoped: a
  * literal outside any `Tf` scope keeps its Latin-1 reading, since
  * unscoped literals are ordinary text while hex strings remain the
  * CID generators' native emission and retain the merged fallback).
  * The UDF signature (`Array[Byte] => Seq[String]`) is the swap point
  * for PDFBox/Tika where dependencies exist.
  */
object PdfText extends Serializable {

  /** One content stream's decode work with everything document-global
    * already resolved (inflated body, the stream's font→CMap scope, the
    * document-merged CMap): the unit of WITHIN-document parallelism —
    * [[streamText]] needs nothing else, so a 500-page document's pages
    * can decode on different executors instead of serializing one task.
    * All fields have standard Spark encoders (binary + nested maps), so
    * a `Dataset[StreamTask]`-shaped row shuffles freely; total shuffled
    * bytes ≈ the document's inflated size, not size × streams. */
  case class StreamTask(idx: Int, body: Array[Byte],
                        fonts: Map[String, Map[Int, String]],
                        merged: Map[Int, String])

  /** Stage A (document-global, one pass per document): object graph,
    * per-stream font contexts, merged CMap — everything that needs the
    * WHOLE file — emitted as independently-decodable [[StreamTask]]s in
    * document order. When the file carries an object structure the
    * per-stream font context scopes CID decoding; otherwise the
    * merged-CMap path stands alone (mini fixtures, damaged files). */
  def streamTasks(bytes: Array[Byte]): Seq[StreamTask] = {
    val objs = parseObjects(bytes)
    val withStreams = objs.values.filter(_.stream.isDefined).toSeq.sortBy(_.offset)
    val ordered =
      if (withStreams.nonEmpty) {
        val ctx = fontContexts(objs)
        withStreams.map(o =>
          (o.stream.get, ctx.getOrElse(o.num, Map.empty[String, Map[Int, String]])))
      } else inflatedStreams(bytes).map(cs => (cs, Map.empty[String, Map[Int, String]]))
    val merged = toUnicodeMap(ordered.map(_._1))
    ordered.zipWithIndex.map { case ((cs, fonts), i) => StreamTask(i, cs, fonts, merged) }
  }

  /** Stage B (per stream, location-free): one task's text block, None
    * for non-text streams (no show operators / whitespace-only). */
  def streamText(t: StreamTask): Option[String] =
    if (containsShowOp(t.body)) {
      val txt = extractText(t.body, t.fonts, t.merged)
      if (txt.exists(!_.isWhitespace)) Some(normalize(txt)) else None
    } else None

  /** Extract per-content-stream text blocks ("pages": the corpus emits
    * one content stream per page) — the single-task composition of
    * [[streamTasks]] + [[streamText]], so the golden fixtures pin both
    * halves of the distributed path too. */
  def pages(bytes: Array[Byte]): Seq[String] =
    streamTasks(bytes).flatMap(streamText(_))

  /** One indirect object: number, dict text (body before any stream
    * keyword, ISO-8859-1), inflated stream if present, byte offset. */
  private case class PdfObj(num: Int, dict: String,
                            stream: Option[Array[Byte]], offset: Int,
                            hadStream: Boolean = false)

  private val objHeader = "(?m)(\\d+)\\s+(\\d+)\\s+obj".r

  /** Linear scan of `N G obj … endobj` segments — works without the
    * xref table. Stream bodies are skipped before searching `endobj`
    * so binary data containing the keyword cannot truncate an object. */
  private def parseObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val doc = new String(bytes, "ISO-8859-1")
    val out = scala.collection.mutable.HashMap.empty[Int, PdfObj]
    var from = 0
    var more = true
    while (more) {
      objHeader.findFirstMatchIn(doc.substring(from)) match {
        case None => more = false
        case Some(m) =>
          val start = from + m.end
          val num = m.group(1).toInt
          val sIdx = doc.indexOf("stream", start)
          val eIdx = doc.indexOf("endobj", start)
          if (eIdx < 0) { more = false }
          else if (sIdx >= 0 && sIdx < eIdx) {
            // dict, then a stream: jump over the body via endstream
            var k = sIdx + 6
            if (k + 1 < doc.length && doc.charAt(k) == '\r' && doc.charAt(k + 1) == '\n') k += 2
            else if (k < doc.length && doc.charAt(k) == '\n') k += 1
            val es = doc.indexOf("endstream", k)
            if (es < 0) { more = false }
            else {
              val inflated = inflate(bytes, k, es)
              out(num) = PdfObj(num, doc.substring(start, sIdx), inflated,
                from + m.start, hadStream = true)
              val eo = doc.indexOf("endobj", es)
              from = if (eo < 0) es + 9 else eo + 6
            }
          } else {
            out(num) = PdfObj(num, doc.substring(start, eIdx), None, from + m.start)
            from = eIdx + 6
          }
      }
    }
    out.toMap
  }

  private val refPat = "(\\d+)\\s+\\d+\\s+R".r
  private val fontEntry = "/([^\\s/<>\\[\\]()]+)\\s+(\\d+)\\s+\\d+\\s+R".r
  private val toUniRef = "/ToUnicode\\s+(\\d+)\\s+\\d+\\s+R".r

  /** The `<<…>>` dict starting at or after `from` in `s`, balanced. */
  private def balancedDict(s: String, from: Int): Option[String] = {
    val open = s.indexOf("<<", from)
    if (open < 0) return None
    var depth = 0
    var i = open
    while (i + 1 < s.length) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '<') { depth += 1; i += 2 }
      else if (s.charAt(i) == '>' && s.charAt(i + 1) == '>') {
        depth -= 1; i += 2
        if (depth == 0) return Some(s.substring(open, i))
      } else i += 1
    }
    None
  }

  /** `/key` value as dict text: inline `<<…>>` or an indirect ref's
    * dict. Returns None when the key is absent. */
  private def dictValue(dict: String, key: String,
                        objs: Map[Int, PdfObj]): Option[String] = {
    val at = dict.indexOf(s"/$key")
    if (at < 0) return None
    val after = dict.substring(at + key.length + 1)
    val trimmed = after.dropWhile(c => c == ' ' || c == '\n' || c == '\r' || c == '\t')
    if (trimmed.startsWith("<<")) balancedDict(trimmed, 0)
    else refPat.findPrefixMatchOf(trimmed)
      .flatMap(m => objs.get(m.group(1).toInt)).map(_.dict)
  }

  /** name → CMap for one resources dict (its `/Font` sub-dict). */
  private def fontsOf(resources: String, objs: Map[Int, PdfObj],
                      cmaps: Map[Int, Map[Int, String]]): Map[String, Map[Int, String]] =
    dictValue(resources, "Font", objs).map { fd =>
      fontEntry.findAllMatchIn(fd).flatMap { e =>
        objs.get(e.group(2).toInt).flatMap(f =>
          toUniRef.findFirstMatchIn(f.dict)
            .flatMap(r => cmaps.get(r.group(1).toInt))
            .map(cm => e.group(1) -> cm))
      }.toMap
    }.getOrElse(Map.empty)

  /** Per-content-stream font context: page `/Contents` streams get the
    * page's resources (inherited through `/Parent` when absent); any
    * stream object with its own `/Resources` (Form XObjects) gets
    * those. */
  private def fontContexts(objs: Map[Int, PdfObj]): Map[Int, Map[String, Map[Int, String]]] = {
    val cmaps: Map[Int, Map[Int, String]] = objs.collect {
      case (num, o) if o.stream.exists(cs =>
        indexOf(cs, "beginbfchar", 0) >= 0 || indexOf(cs, "beginbfrange", 0) >= 0) =>
        num -> parseCmap(new String(o.stream.get, "ISO-8859-1"))
    }
    if (cmaps.isEmpty) return Map.empty
    val out = scala.collection.mutable.HashMap.empty[Int, Map[String, Map[Int, String]]]
    // page contents inherit resources up the /Parent chain (PDF 32000-1
    // §7.7.3.4); cap the walk so a cyclic Parent ref cannot loop
    objs.values.foreach { o =>
      if (o.dict.contains("/Type") && "/Type\\s*/Page\\b".r.findFirstIn(o.dict).isDefined
        && !o.dict.contains("/Type /Pages") && !o.dict.contains("/Type/Pages")) {
        var cur: Option[PdfObj] = Some(o)
        var res: Option[String] = None
        var hops = 0
        while (res.isEmpty && cur.isDefined && hops < 32) {
          res = dictValue(cur.get.dict, "Resources", objs)
          cur = "/Parent\\s+(\\d+)\\s+\\d+\\s+R".r.findFirstMatchIn(cur.get.dict)
            .flatMap(m => objs.get(m.group(1).toInt))
          hops += 1
        }
        res.foreach { r =>
          val fonts = fontsOf(r, objs, cmaps)
          if (fonts.nonEmpty) {
            // /Contents: one ref, or an array of refs
            val contents: Seq[Int] = {
              val at = o.dict.indexOf("/Contents")
              if (at < 0) Seq.empty
              else {
                val t = o.dict.substring(at + "/Contents".length)
                  .dropWhile(_.isWhitespace)
                if (t.startsWith("[")) {
                  val end = t.indexOf(']')
                  if (end < 0) Seq.empty
                  else refPat.findAllMatchIn(t.substring(1, end))
                    .map(_.group(1).toInt).toSeq
                } else refPat.findPrefixMatchOf(t).map(_.group(1).toInt).toSeq
              }
            }
            contents.foreach(c => out(c) = fonts)
          }
        }
      }
      // a stream object carrying its own /Resources (Form XObject)
      if (o.stream.isDefined && o.dict.contains("/Resources")) {
        dictValue(o.dict, "Resources", objs).foreach { r =>
          val fonts = fontsOf(r, objs, cmaps)
          if (fonts.nonEmpty) out(o.num) = fonts
        }
      }
    }
    out.toMap
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

  /** Decode-ceiling audit: for every stream object whose body was NOT
    * decoded — a non-Flate filter (DCT/LZW/...), a filter chain, a
    * plain body the Inflater rejects, or corrupt Flate — the declared
    * `/Filter` name(s) → count (`none` when the dict declares no
    * filter). Empty map = the document decodes in full. This is the
    * quarantine channel for the documented zero-egress ceiling
    * (FlateDecode-only, TEST:63): a real-world corpus with DCT/LZW/
    * xref-stream PDFs REPORTS what it skipped per file instead of
    * thinning silently. */
  def filterAudit(bytes: Array[Byte]): Map[String, Int] = {
    val objs = parseObjects(bytes)
    objs.values
      .filter(o => o.hadStream && o.stream.isEmpty).toSeq
      .map(o => filterLabel(o.dict, objs))
      .groupBy(identity).view.mapValues(_.size).toMap
  }

  /** One label per stream (so the audit's counts SUM to the number of
    * undecoded streams): a single `/Name`; a decode-order chain joined
    * as `A+B` (one stream, not one count per element); an indirect
    * `/Filter n 0 R` resolved through the object graph (PDF 32000-1
    * §7.3.8) — `indirect` only when the referenced object is absent;
    * `none` when the dict declares no filter at all. */
  private val filterRe =
    "/Filter\\s*(?:\\[([^\\]]*)\\]|/([A-Za-z0-9]+)|(\\d+)\\s+\\d+\\s+R)".r
  private def namesIn(s: String): Seq[String] =
    "/([A-Za-z0-9]+)".r.findAllMatchIn(s).map(_.group(1)).toSeq
  private def filterLabel(dict: String, objs: Map[Int, PdfObj]): String =
    filterRe.findFirstMatchIn(dict) match {
      case None => "none"
      case Some(m) if m.group(2) != null => m.group(2)
      case Some(m) if m.group(1) != null =>
        val ns = namesIn(m.group(1))
        if (ns.isEmpty) "none" else ns.mkString("+")
      case Some(m) =>
        objs.get(m.group(3).toInt).map(o => namesIn(o.dict)) match {
          case Some(ns) if ns.nonEmpty => ns.mkString("+")
          case _ => "indirect"
        }
    }

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

  /** One ToUnicode CMap stream's 2-byte-code → unicode map. Only
    * 4-hex-digit source codes participate: 1-byte simple-font CMaps
    * must not reinterpret ordinary Latin-1 hex strings. */
  private def parseCmap(txt: String): Map[Int, String] = {
    val m = scala.collection.mutable.HashMap.empty[Int, String]
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
    m.toMap
  }

  /** Merged document-level map over every CMap stream, first entry
    * winning — the fallback when no per-font scope resolves. */
  private def toUnicodeMap(streams: Seq[Array[Byte]]): Map[Int, String] = {
    val m = scala.collection.mutable.HashMap.empty[Int, String]
    streams.foreach { cs =>
      if (indexOf(cs, "beginbfchar", 0) >= 0 || indexOf(cs, "beginbfrange", 0) >= 0)
        parseCmap(new String(cs, "ISO-8859-1")).foreach { case (k, v) =>
          m.getOrElseUpdate(k, v)
        }
    }
    m.toMap
  }

  /** CID path: an even-byte hex string whose 2-byte codes ALL map
    * decodes through a CMap — the ACTIVE font's first, the merged
    * document map second; any miss keeps the Latin-1 reading. */
  private def decodeCid(raw: String, active: Option[Map[Int, String]],
                        merged: Map[Int, String]): String = {
    def through(cmap: Map[Int, String]): Option[String] = {
      if (cmap.isEmpty || raw.isEmpty || raw.length % 2 != 0) return None
      val sb = new StringBuilder
      var i = 0
      while (i < raw.length) {
        val code = (raw.charAt(i) << 8) | raw.charAt(i + 1)
        cmap.get(code) match {
          case Some(u) => sb.append(u)
          case None => return None
        }
        i += 2
      }
      Some(sb.toString)
    }
    active.flatMap(through).orElse(through(merged)).getOrElse(raw)
  }

  private def isNameChar(c: Int): Boolean =
    c > ' ' && c != '(' && c != ')' && c != '<' && c != '>' && c != '[' &&
      c != ']' && c != '{' && c != '}' && c != '/' && c != '%'

  /** Tokenize a content stream: literal strings accumulate on a pending
    * stack; show operators flush them to output. `/Name … Tf` switches
    * the active font, scoping CID decode to that font's CMap. */
  private def extractText(cs: Array[Byte], fonts: Map[String, Map[Int, String]],
                          merged: Map[Int, String]): String = {
    val sb = new StringBuilder
    val pending = new StringBuilder
    var lastName = ""
    var active: Option[Map[Int, String]] = None
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
        // under an active CID font, a literal string's bytes are 2-byte
        // codes too (some generators emit `(…)` instead of hex) — decode
        // through THAT font's CMap only, all-codes-map gated. No merged
        // fallback for literals: unlike hex strings (the CID generators'
        // native emission), a literal outside any Tf scope is ordinary
        // text and must stay byte-for-byte Latin-1.
        pending.append(
          if (active.isDefined) decodeCid(buf.toString, active, Map.empty)
          else buf)
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
          pending.append(decodeCid(buf.toString, active, merged))
          i = j + 1
        } else i += 1
      } else if (c == '/') {
        // name token — remembered so a following Tf can resolve the font
        var j = i + 1
        val nb = new StringBuilder
        while (j < n && isNameChar(cs(j) & 0xff)) { nb.append((cs(j) & 0xff).toChar); j += 1 }
        lastName = nb.toString
        i = j
      } else if (c == 'T' && i + 1 < n && (cs(i + 1) & 0xff) == 'f') {
        active = fonts.get(lastName)
        i += 2
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
