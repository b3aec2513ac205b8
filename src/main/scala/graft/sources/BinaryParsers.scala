package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{Inflater, ZipInputStream}

/** Pure-JVM binary document parsers (S8 registry entries: `pdf`,
  * `docx`, `pptx`, `xlsx`, and — via the [[Cfb]] compound-file
  * reader — the legacy OLE family `doc`/`ppt`/`xls`/`msg`).
  *
  * The reference routes these through the `unstructured` library
  * (shared/text_processing/parsers/unstructured.py:15-155); the
  * text-extraction CONTRACT is the same — binary in, plain text +
  * status out — re-implemented here on JDK primitives only (this
  * container has no Tika/PDFBox; on a real cluster either drops into
  * the same slot).
  *
  * Scope (documented limitations, marked by `parse_status`):
  *  - PDF: text is pulled from page content streams (raw or
  *    FlateDecode) by interpreting the text-showing operators
  *    (Tj / ' / " / TJ). Single-byte encodings (Standard/WinAnsi)
  *    round-trip; CID/Type0-composite fonts would need font CMaps and
  *    are out of scope — typical for lightweight extractors.
  *  - DOCX: text of `word/document.xml` — `<w:t>` runs, with
  *    `<w:br/>`/`<w:cr/>` → newline, `<w:tab/>` → tab, `</w:p>` →
  *    newline, XML entities unescaped.
  *
  * Everything here is per-row and allocation-bounded by the document
  * size: the operator is a narrow map over the scan, no shuffle at any
  * corpus size.
  */
object BinaryParsers {

  /** (text, status): status is "ok", "empty", or "error:<why>". */
  case class ParseResult(text: String, status: String)

  def parse(content: Array[Byte], parser: String): ParseResult =
    if (content == null || content.isEmpty) ParseResult("", "error:empty")
    else parser match {
      case "pdf"  => pdf(content)
      case "docx" => docx(content)
      case "pptx" => pptx(content)
      case "xlsx" => xlsx(content)
      case "doc"  => doc(content)
      case "ppt"  => ppt(content)
      case "xls"  => xls(content)
      case "msg"  => msg(content)
      case _      => ParseResult("", "stubbed")
    }

  // ---------------------------------------------------------------- PDF

  private val PdfMagic = "%PDF-".getBytes(StandardCharsets.ISO_8859_1)

  def pdf(bytes: Array[Byte]): ParseResult = {
    if (bytes.length < PdfMagic.length ||
        !PdfMagic.indices.forall(i => bytes(i) == PdfMagic(i)))
      return ParseResult("", "error:not_pdf")
    try {
      // ISO-8859-1 is 1:1 byte<->char, so string offsets == byte offsets.
      val s = new String(bytes, StandardCharsets.ISO_8859_1)
      val texts = contentStreams(s, bytes)
        .map(b => reDecodeUtf8(extractText(b))).filter(_.nonEmpty)
      if (texts.isEmpty) ParseResult("", "empty")
      else ParseResult(texts.mkString("\n"), "ok")
    } catch {
      case e: Exception =>
        ParseResult("", "error:" + e.getClass.getSimpleName)
    }
  }

  /** Decoded bytes of every stream object (raw, or inflated when its
    * dictionary says /FlateDecode). Malformed/undecodable streams are
    * skipped, not fatal. */
  private def contentStreams(s: String, bytes: Array[Byte]): Seq[Array[Byte]] = {
    val out = Seq.newBuilder[Array[Byte]]
    var from = 0
    while ({ val i = s.indexOf("stream", from); i >= 0 && {
      // "endstream" also contains "stream" — require a dict end or
      // whitespace before the keyword so we only match stream starts.
      val isStart = i == 0 || { val c = s.charAt(i - 1)
        c == '>' || c == ' ' || c == '\n' || c == '\r' || c == '\t' }
      var data = i + "stream".length
      if (data < s.length && s.charAt(data) == '\r') data += 1
      if (data < s.length && s.charAt(data) == '\n') data += 1
      val dict = if (isStart) dictBefore(s, i) else ""
      // Prefer the dictionary's /Length to delimit the stream — a
      // stream whose BODY happens to contain the keyword "endstream"
      // is then still parsed whole; fall back to keyword scan.
      val explicit = LengthRe.findFirstMatchIn(dict)
        .map(m => data + m.group(1).toInt)
        .filter { stop =>
          var p = stop
          if (p < s.length && s.charAt(p) == '\r') p += 1
          if (p < s.length && s.charAt(p) == '\n') p += 1
          stop >= data && s.startsWith("endstream", p)
        }
      val end = explicit.getOrElse(s.indexOf("endstream", data))
      if (isStart && end >= data) {
        var stop = end
        if (explicit.isEmpty) {
          if (stop > data && s.charAt(stop - 1) == '\n') stop -= 1
          if (stop > data && s.charAt(stop - 1) == '\r') stop -= 1
        }
        val raw = java.util.Arrays.copyOfRange(bytes, data, stop)
        if (dict.contains("/FlateDecode")) inflate(raw).foreach(out += _)
        else out += raw
        from = s.indexOf("endstream", stop) match {
          case -1 => s.length
          case e  => e + "endstream".length
        }
      } else from = i + "stream".length
      true
    }}) ()
    out.result()
  }

  private val LengthRe = "/Length\\s+(\\d+)".r

  /** Strings shown in a PDF come out as raw bytes (latin-1 chars here);
    * if those bytes form valid UTF-8 with at least one multi-byte
    * sequence, re-decode — text written as UTF-8 octets round-trips,
    * while true Win/Mac-Ansi bytes (rarely valid UTF-8) stay as-is. */
  private def reDecodeUtf8(latin1: String): String = {
    if (!latin1.exists(_ > 0x7f)) return latin1
    try StandardCharsets.UTF_8.newDecoder()
      .decode(java.nio.ByteBuffer.wrap(
        latin1.getBytes(StandardCharsets.ISO_8859_1))).toString
    catch { case _: Exception => latin1 }
  }

  /** The balanced `<< ... >>` dictionary immediately before offset. */
  private def dictBefore(s: String, pos: Int): String = {
    val close = s.lastIndexOf(">>", pos)
    if (close < 0) return ""
    var depth = 1
    var j = close - 1
    while (j > 0) {
      if (s.charAt(j) == '>' && s.charAt(j - 1) == '>') { depth += 1; j -= 2 }
      else if (s.charAt(j) == '<' && s.charAt(j - 1) == '<') {
        depth -= 1
        if (depth == 0) return s.substring(j - 1, close + 2)
        j -= 2
      } else j -= 1
    }
    ""
  }

  private def inflate(data: Array[Byte]): Option[Array[Byte]] =
    try {
      val inf = new Inflater()
      inf.setInput(data)
      val out = new java.io.ByteArrayOutputStream(data.length * 4)
      val buf = new Array[Byte](8192)
      var stuck = false
      while (!inf.finished() && !stuck) {
        val n = inf.inflate(buf)
        if (n > 0) out.write(buf, 0, n)
        else if (inf.needsInput() || inf.needsDictionary()) stuck = true
      }
      inf.end()
      if (stuck && out.size() == 0) None else Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** Text-showing operators of one content stream.
    *
    * Newlines are inserted BETWEEN shown strings on line-moving
    * operators (T*, Td, TD, ', ") and at ET — never appended at the
    * end — so a single `(...) Tj` stream round-trips its string
    * exactly (the property `parser_pdf_roundtrip`'s oracle checks
    * hash-exact). */
  private def extractText(streamBytes: Array[Byte]): String = {
    val s = new String(streamBytes, StandardCharsets.ISO_8859_1)
    val sb = new StringBuilder
    val operands = collection.mutable.ArrayBuffer.empty[String]
    var pendingBreak = false
    def show(t: String): Unit = {
      if (pendingBreak && sb.nonEmpty) sb.append('\n')
      pendingBreak = false
      sb.append(t)
    }
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '(') { val (t, j) = literalString(s, i); operands += t; i = j }
      else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') i += 2
      else if (c == '>' && i + 1 < n && s.charAt(i + 1) == '>') i += 2
      else if (c == '<') { val (t, j) = hexString(s, i); operands += t; i = j }
      else if (c == '[' || c == ']') i += 1
      else if (c == '%') { while (i < n && s.charAt(i) != '\n') i += 1 }
      else if (c == '/' || c.isDigit || c == '+' || c == '-' || c == '.') {
        // name or number — not text; skip the token
        i += 1
        while (i < n && !" \t\r\n()<>[]/%".contains(s.charAt(i))) i += 1
      } else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
      else {
        val start = i
        while (i < n && !" \t\r\n()<>[]/%".contains(s.charAt(i))) i += 1
        s.substring(start, i) match {
          case "Tj" | "TJ" => operands.foreach(show); operands.clear()
          case "'" => pendingBreak = true; operands.foreach(show); operands.clear()
          case "\"" => pendingBreak = true; operands.foreach(show); operands.clear()
          case "Td" | "TD" | "T*" => pendingBreak = true; operands.clear()
          case "ET" => pendingBreak = true; operands.clear()
          case _ => operands.clear()
        }
      }
    }
    sb.toString
  }

  /** PDF literal string `(...)` with nesting + backslash escapes;
    * returns (decoded, index-after-close). */
  private def literalString(s: String, open: Int): (String, Int) = {
    val sb = new StringBuilder
    var depth = 1
    var i = open + 1
    val n = s.length
    while (i < n && depth > 0) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case '(' => sb.append('('); i += 2
          case ')' => sb.append(')'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case '\r' => // line continuation
            i += 2; if (i < n && s.charAt(i) == '\n') i += 1
          case '\n' => i += 2
          case d if d >= '0' && d <= '7' =>
            var v = 0; var k = 0; i += 1
            while (k < 3 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
              v = v * 8 + (s.charAt(i) - '0'); i += 1; k += 1
            }
            sb.append((v & 0xff).toChar)
          case other => sb.append(other); i += 2
        }
      } else if (c == '(') { depth += 1; sb.append(c); i += 1 }
      else if (c == ')') { depth -= 1; if (depth > 0) sb.append(c); i += 1 }
      else { sb.append(c); i += 1 }
    }
    (sb.toString, i)
  }

  /** PDF hex string `<...>`; odd final digit padded with 0. */
  private def hexString(s: String, open: Int): (String, Int) = {
    val close = s.indexOf('>', open + 1)
    if (close < 0) return ("", s.length)
    val hex = s.substring(open + 1, close).filter(c =>
      Character.digit(c, 16) >= 0)
    val padded = if (hex.length % 2 == 0) hex else hex + "0"
    val sb = new StringBuilder(padded.length / 2)
    var i = 0
    while (i < padded.length) {
      sb.append(Integer.parseInt(padded.substring(i, i + 2), 16).toChar)
      i += 2
    }
    (sb.toString, close + 1)
  }

  // --------------------------------------------------------------- DOCX

  private val DocxTok =
    "(?s)<w:t(?:\\s[^>]*)?>(.*?)</w:t>|<w:(?:br|cr)\\s*/>|<w:tab\\s*/>|</w:p>".r

  def docx(bytes: Array[Byte]): ParseResult =
    try {
      // OOXML is a zip; anything without the PK local-header magic is
      // not a docx (deterministic status for the dispatch oracle).
      if (bytes.length < 4 || bytes(0) != 'P' || bytes(1) != 'K')
        return ParseResult("", "error:not_docx")
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      var xml: String = null
      var entry = zin.getNextEntry
      var sawEntry = false
      while (entry != null && xml == null) {
        sawEntry = true
        if (entry.getName == "word/document.xml")
          xml = new String(zin.readAllBytes(), StandardCharsets.UTF_8)
        entry = zin.getNextEntry
      }
      zin.close()
      if (xml == null)
        ParseResult("", if (sawEntry) "error:no_document_xml" else "error:not_docx")
      else {
        val sb = new StringBuilder
        for (m <- DocxTok.findAllMatchIn(xml)) {
          if (m.group(1) != null) sb.append(unescapeXml(m.group(1)))
          else if (m.matched.startsWith("<w:tab")) sb.append('\t')
          else sb.append('\n')
        }
        // </w:p> of the last paragraph leaves one trailing newline
        val text = sb.toString.reverse.dropWhile(_ == '\n').reverse
        if (text.isEmpty) ParseResult("", "empty") else ParseResult(text, "ok")
      }
    } catch {
      case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
    }

  // --------------------------------------------------------- PPTX / XLSX
  // Same OOXML family as docx: a zip of XML parts. PPTX text lives in
  // ppt/slides/slideN.xml (<a:t> runs, </a:p>/<a:br/> break lines);
  // XLSX cell text in xl/worksheets/sheetN.xml with string cells
  // indirected through xl/sharedStrings.xml (<si> items, whose rich-
  // text runs each carry a <t>). Ref: unstructured.py routes both
  // through partition_pptx/partition_xlsx; the extraction contract —
  // binary in, plain text out, cells tab-separated, rows/paragraphs
  // newline-separated — is re-expressed on JDK zip + regex only.

  /** Zip entries whose names match `keep`, in archive order. */
  private def zipEntries(bytes: Array[Byte], keep: String => Boolean): Option[Seq[(String, String)]] = {
    if (bytes.length < 4 || bytes(0) != 'P' || bytes(1) != 'K') return None
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[(String, String)]
    var sawEntry = false
    var entry = zin.getNextEntry
    while (entry != null) {
      sawEntry = true
      if (keep(entry.getName))
        out += entry.getName -> new String(zin.readAllBytes(), StandardCharsets.UTF_8)
      entry = zin.getNextEntry
    }
    zin.close()
    if (sawEntry) Some(out.result()) else None
  }

  private val SlideName = "^ppt/slides/slide(\\d+)\\.xml$".r
  private val SheetName = "^xl/worksheets/sheet(\\d+)\\.xml$".r
  private val PptxTok =
    "(?s)<a:t(?:\\s[^>]*)?>(.*?)</a:t>|<a:br\\s*/>|</a:p>".r
  private val SiRe = "(?s)<si>(.*?)</si>".r
  private val TRe = "(?s)<t(?:\\s[^>]*)?>(.*?)</t>".r
  private val RowRe = "(?s)<row(?:\\s[^>]*)?>(.*?)</row>".r
  private val CellRe = "(?s)<c((?:\\s[^>]*)?)(?:/>|>(.*?)</c>)".r
  private val CellTypeRe = "\\bt=\"([^\"]+)\"".r
  private val VRe = "(?s)<v>(.*?)</v>".r

  def pptx(bytes: Array[Byte]): ParseResult =
    try zipEntries(bytes, n => SlideName.pattern.matcher(n).matches) match {
      case None => ParseResult("", "error:not_pptx")
      case Some(slides) if slides.isEmpty => ParseResult("", "error:no_slides")
      case Some(slides) =>
        val texts = slides
          .map { case (SlideName(n), xml) => (n.toInt, xml) }
          .sortBy(_._1)
          .map { case (_, xml) =>
            val sb = new StringBuilder
            for (m <- PptxTok.findAllMatchIn(xml)) {
              if (m.group(1) != null) sb.append(unescapeXml(m.group(1)))
              else sb.append('\n')
            }
            sb.toString.reverse.dropWhile(_ == '\n').reverse
          }
          .filter(_.nonEmpty)
        if (texts.isEmpty) ParseResult("", "empty")
        else ParseResult(texts.mkString("\n"), "ok")
    } catch {
      case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
    }

  def xlsx(bytes: Array[Byte]): ParseResult =
    try zipEntries(bytes, n => n == "xl/sharedStrings.xml" ||
        SheetName.pattern.matcher(n).matches) match {
      case None => ParseResult("", "error:not_xlsx")
      case Some(entries) =>
        val shared: IndexedSeq[String] = entries
          .collectFirst { case ("xl/sharedStrings.xml", xml) => xml }
          .map(xml => SiRe.findAllMatchIn(xml)
            .map(si => TRe.findAllMatchIn(si.group(1))
              .map(t => unescapeXml(t.group(1))).mkString)
            .toIndexedSeq)
          .getOrElse(IndexedSeq.empty)
        val sheets = entries
          .collect { case (SheetName(n), xml) => (n.toInt, xml) }
          .sortBy(_._1)
        if (sheets.isEmpty) ParseResult("", "error:no_sheets")
        else {
          def cellText(attrs: String, body: String): String = {
            val t = CellTypeRe.findFirstMatchIn(attrs).map(_.group(1))
            t match {
              case Some("s") =>
                // Try: a malformed index degrades to an empty cell
                // rather than failing the whole workbook
                VRe.findFirstMatchIn(body)
                  .flatMap(m => scala.util.Try(m.group(1).trim.toInt).toOption)
                  .filter(i => i >= 0 && i < shared.length)
                  .map(shared).getOrElse("")
              case Some("inlineStr") =>
                TRe.findAllMatchIn(body).map(m => unescapeXml(m.group(1))).mkString
              case _ =>
                VRe.findFirstMatchIn(body).map(m => unescapeXml(m.group(1)))
                  .getOrElse("")
            }
          }
          val texts = sheets.map { case (_, xml) =>
            RowRe.findAllMatchIn(xml).map { row =>
              CellRe.findAllMatchIn(row.group(1)).map { c =>
                cellText(c.group(1), Option(c.group(2)).getOrElse(""))
              }.mkString("\t")
            }.filter(_.exists(!_.isWhitespace)).mkString("\n")
          }.filter(_.nonEmpty)
          if (texts.isEmpty) ParseResult("", "empty")
          else ParseResult(texts.mkString("\n"), "ok")
        }
    } catch {
      case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
    }

  // Deterministic single-part synthesizers: the round-trip queries
  // (parser_pptx_roundtrip / parser_xlsx_roundtrip) build a minimal
  // valid archive around each document's text IN-PLAN, extract it back
  // with the real parser above, and hash-check against the original —
  // the same oracle pattern parser_pdf_roundtrip uses. STORED entries
  // with a pinned timestamp keep the bytes bit-stable across runs.
  def synthZip(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    entries.foreach { case (name, data) =>
      val e = new java.util.zip.ZipEntry(name)
      e.setMethod(java.util.zip.ZipEntry.STORED)
      e.setSize(data.length)
      val crc = new java.util.zip.CRC32
      crc.update(data)
      e.setCrc(crc.getValue)
      e.setTime(0L)
      z.putNextEntry(e); z.write(data); z.closeEntry()
    }
    z.close(); bos.toByteArray
  }

  def escapeXml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  def synthPptx(text: String): Array[Byte] =
    synthZip(Seq("ppt/slides/slide1.xml" ->
      (s"<p:sld><p:txBody><a:p><a:r><a:t>${escapeXml(text)}</a:t></a:r>" +
        "</a:p></p:txBody></p:sld>").getBytes(StandardCharsets.UTF_8)))

  def synthXlsx(text: String): Array[Byte] =
    synthZip(Seq("xl/worksheets/sheet1.xml" ->
      (s"""<worksheet><sheetData><row r="1"><c r="A1" t="inlineStr">""" +
        s"<is><t>${escapeXml(text)}</t></is></c></row></sheetData>" +
        "</worksheet>").getBytes(StandardCharsets.UTF_8)))

  // ------------------------------------------- legacy OLE/CFB formats
  // The reference handles these via `unstructured` (registry.py:111-225).
  // Container layer: graft.sources.Cfb. Each extractor targets the
  // format's canonical text stream; unsupported richness degrades to
  // skipped runs, never to a failed document.

  private def u16le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32le(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Word's in-stream control chars → plain text (cell/para marks to
    * newline, field/object markers dropped). */
  private def mapWordChars(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '\r' | '\u0007' | '\u000B' | '\u000C' => sb.append('\n')
      case '\u0001' | '\u0005' | '\u0008' | '\u0013' | '\u0014' |
          '\u0015' => ()
      case c => sb.append(c)
    }
    sb.toString
  }

  /** MS-DOC: FIB in the WordDocument stream points (fcClx/lcbClx,
    * FibRgFcLcb97 offsets 0x01A2/0x01A6) at the CLX piece table in the
    * 0Table/1Table stream; each piece is a (cp range, fc) run of either
    * UTF-16LE or "compressed" cp1252 text. Files without a piece table
    * fall back to the contiguous fcMin..fcMax run. */
  def doc(bytes: Array[Byte]): ParseResult = try {
    if (!Cfb.isCfb(bytes)) return ParseResult("", "error:not_ole")
    val cfb = Cfb.read(bytes)
    val wd = cfb.stream("WordDocument")
      .getOrElse(return ParseResult("", "error:no_worddocument"))
    if (wd.length < 0x200 || u16le(wd, 0) != 0xA5EC)
      return ParseResult("", "error:not_doc")
    val tableName =
      if ((u16le(wd, 0x0A) & 0x0200) != 0) "1Table" else "0Table"
    val fcClx = i32le(wd, 0x01A2)
    val lcbClx = i32le(wd, 0x01A6)
    val pieces: Seq[String] = cfb.stream(tableName) match {
      case Some(tbl) if lcbClx > 4 && fcClx >= 0 &&
          fcClx + lcbClx <= tbl.length =>
        // CLX: Prc blocks (0x01 + 2-byte len) then Pcdt (0x02 + 4-byte
        // lcb + PlcPcd)
        var i = fcClx
        val end = fcClx + lcbClx
        var plc: Option[(Int, Int)] = None // (offset, len) of PlcPcd
        while (i < end && plc.isEmpty) {
          (tbl(i) & 0xFF) match {
            case 0x01 => i += 3 + u16le(tbl, i + 1)
            case 0x02 => plc = Some((i + 5, i32le(tbl, i + 1))); i = end
            case _ => i = end // unknown tag: stop, fall back below
          }
        }
        plc match {
          case Some((off, len)) if len >= 16 && off + len <= tbl.length =>
            val n = (len - 4) / 12
            val cps = (0 to n).map(k => i32le(tbl, off + 4 * k))
            (0 until n).map { k =>
              val pcd = off + 4 * (n + 1) + 8 * k
              val fc = i32le(tbl, pcd + 2)
              val count = cps(k + 1) - cps(k)
              val compressed = (fc & 0x40000000) != 0
              val at = fc & 0x3FFFFFFF
              if (compressed) {
                val start = at / 2
                new String(wd, start, math.min(count, wd.length - start),
                  Cp1252)
              } else
                new String(wd, at, math.min(2 * count, wd.length - at),
                  StandardCharsets.UTF_16LE)
            }
          case _ => Seq.empty
        }
      case _ => Seq.empty
    }
    val text = mapWordChars(
      if (pieces.nonEmpty) pieces.mkString
      else { // pre-Word97 fallback: contiguous ANSI run
        val fcMin = i32le(wd, 0x18)
        val fcMax = i32le(wd, 0x1C)
        if (fcMin >= 0 && fcMax > fcMin && fcMax <= wd.length)
          new String(wd, fcMin, fcMax - fcMin, Cp1252)
        else ""
      })
    if (text.exists(!_.isWhitespace)) ParseResult(text, "ok")
    else ParseResult("", "empty")
  } catch {
    case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
  }

  /** MS-PPT: the "PowerPoint Document" stream is a record tree;
    * TextCharsAtom (0x0FA0, UTF-16LE) and TextBytesAtom (0x0FA8,
    * cp1252) carry the slide text, in document order. */
  def ppt(bytes: Array[Byte]): ParseResult = try {
    if (!Cfb.isCfb(bytes)) return ParseResult("", "error:not_ole")
    val cfb = Cfb.read(bytes)
    val st = cfb.stream("PowerPoint Document")
      .getOrElse(return ParseResult("", "error:no_ppt_stream"))
    val out = Seq.newBuilder[String]
    def walk(from: Int, until: Int): Unit = {
      var i = from
      while (i + 8 <= until) {
        val verInstance = u16le(st, i)
        val recType = u16le(st, i + 2)
        val recLen = i32le(st, i + 4)
        val payload = i + 8
        if (recLen < 0 || payload + recLen > until) return // truncated
        if ((verInstance & 0x000F) == 0x000F) walk(payload, payload + recLen)
        else if (recType == 0x0FA0)
          out += new String(st, payload, recLen, StandardCharsets.UTF_16LE)
        else if (recType == 0x0FA8)
          out += new String(st, payload, recLen, Cp1252)
        i = payload + recLen
      }
    }
    walk(0, st.length)
    val texts = out.result().map(mapWordChars).filter(_.exists(!_.isWhitespace))
    if (texts.isEmpty) ParseResult("", "empty")
    else ParseResult(texts.mkString("\n"), "ok")
  } catch {
    case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
  }

  /** BIFF8 XLUnicodeRichExtendedString at `off`; returns (text, next
    * offset). Rich-run / ext-rst payloads are skipped. */
  private def biffString(b: Array[Byte], off: Int): (String, Int) = {
    val cch = u16le(b, off)
    val flags = b(off + 2) & 0xFF
    var p = off + 3
    val cRun = if ((flags & 0x08) != 0) { val n = u16le(b, p); p += 2; n }
      else 0
    val cbExt = if ((flags & 0x04) != 0) { val n = i32le(b, p); p += 4; n }
      else 0
    val wide = (flags & 0x01) != 0
    val text =
      if (wide) { val t = new String(b, p, 2 * cch,
        StandardCharsets.UTF_16LE); p += 2 * cch; t }
      else { val t = new String(b, p, cch, Cp1252); p += cch; t }
    (text, p + 4 * cRun + cbExt)
  }

  /** MS-XLS (BIFF8): SST shared strings + LABELSST/LABEL cell records
    * from the Workbook stream, in record order. SSTs spanning CONTINUE
    * records are truncated at the record boundary (documented; the
    * fixtures and typical small sheets fit one record). */
  def xls(bytes: Array[Byte]): ParseResult = try {
    if (!Cfb.isCfb(bytes)) return ParseResult("", "error:not_ole")
    val cfb = Cfb.read(bytes)
    val st = cfb.stream("Workbook").orElse(cfb.stream("Book"))
      .getOrElse(return ParseResult("", "error:no_workbook"))
    val sst = scala.collection.mutable.ArrayBuffer[String]()
    val cells = Seq.newBuilder[String]
    var i = 0
    while (i + 4 <= st.length) {
      val recType = u16le(st, i)
      val recLen = u16le(st, i + 2)
      val payload = i + 4
      if (payload + recLen > st.length) i = st.length
      else {
        recType match {
          case 0x00FC => // SST: cstTotal(4) cstUnique(4) strings...
            val unique = i32le(st, payload + 4)
            var p = payload + 8
            var k = 0
            while (k < unique && p + 3 <= payload + recLen) {
              val (t, np) = biffString(st, p)
              if (np <= payload + recLen) { sst += t; p = np }
              else k = unique // truncated by CONTINUE: stop
              k += 1
            }
          case 0x00FD => // LABELSST: row col ixfe isst
            val isst = i32le(st, payload + 6)
            if (isst >= 0 && isst < sst.length) cells += sst(isst)
          case 0x0204 => // LABEL: row col ixfe + unicode string
            cells += biffString(st, payload + 6)._1
          case _ => ()
        }
        i = payload + recLen
      }
    }
    val texts = cells.result().filter(_.exists(!_.isWhitespace))
    if (texts.isEmpty) ParseResult("", "empty")
    else ParseResult(texts.mkString("\n"), "ok")
  } catch {
    case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
  }

  /** MS-OXMSG: the plain-text body lives in the __substg1.0_1000001F
    * (UTF-16LE) or __substg1.0_1000001E (cp1252) property stream. */
  def msg(bytes: Array[Byte]): ParseResult = try {
    if (!Cfb.isCfb(bytes)) return ParseResult("", "error:not_ole")
    val cfb = Cfb.read(bytes)
    val text = cfb.streamByPrefix("__substg1.0_1000001F")
      .map(b => new String(b, StandardCharsets.UTF_16LE))
      .orElse(cfb.streamByPrefix("__substg1.0_1000001E")
        .map(b => new String(b, Cp1252)))
      .getOrElse(return ParseResult("", "error:no_body"))
    if (text.exists(!_.isWhitespace)) ParseResult(text, "ok")
    else ParseResult("", "empty")
  } catch {
    case e: Exception => ParseResult("", "error:" + e.getClass.getSimpleName)
  }

  /** Deterministic .doc synthesizer: 1 KiB zeroed FIB region (wIdent,
    * nFib=0x00C1, fcClx/lcbClx) + the text as a single compressed-ANSI
    * piece; CLX piece table in 0Table. */
  def synthDoc(text: String): Array[Byte] = {
    val textBytes = text.getBytes(Cp1252)
    val fibSize = 1024
    val wd = new Array[Byte](fibSize + textBytes.length)
    def put16(off: Int, v: Int): Unit = {
      wd(off) = (v & 0xFF).toByte; wd(off + 1) = ((v >> 8) & 0xFF).toByte }
    def put32(off: Int, v: Int): Unit = { put16(off, v & 0xFFFF)
      put16(off + 2, (v >>> 16) & 0xFFFF) }
    put16(0, 0xA5EC)
    put16(2, 0x00C1)
    System.arraycopy(textBytes, 0, wd, fibSize, textBytes.length)
    // CLX: Pcdt (0x02 + lcb) + PlcPcd with one compressed piece
    val n = 1
    val plcLen = 4 * (n + 1) + 8 * n
    val clx = new Array[Byte](5 + plcLen)
    clx(0) = 0x02
    def cput32(off: Int, v: Int): Unit = {
      clx(off) = (v & 0xFF).toByte
      clx(off + 1) = ((v >> 8) & 0xFF).toByte
      clx(off + 2) = ((v >> 16) & 0xFF).toByte
      clx(off + 3) = ((v >> 24) & 0xFF).toByte
    }
    cput32(1, plcLen)
    cput32(5, 0)                       // cp start
    cput32(9, text.length)             // cp end
    // PCD: 2 flag bytes, fc (compressed bit + 2*offset), 2 prm bytes
    cput32(5 + 8 + 2, 0x40000000 | (fibSize * 2))
    put32(0x01A2, 0)                   // fcClx within 0Table
    put32(0x01A6, clx.length)
    Cfb.write(Seq("WordDocument" -> wd, "0Table" -> clx))
  }

  /** Deterministic .ppt synthesizer: one TextCharsAtom record. */
  def synthPpt(text: String): Array[Byte] = {
    val utf16 = text.getBytes(StandardCharsets.UTF_16LE)
    val rec = new Array[Byte](8 + utf16.length)
    rec(0) = 0; rec(1) = 0
    rec(2) = 0xA0.toByte; rec(3) = 0x0F // TextCharsAtom
    rec(4) = (utf16.length & 0xFF).toByte
    rec(5) = ((utf16.length >> 8) & 0xFF).toByte
    rec(6) = ((utf16.length >> 16) & 0xFF).toByte
    rec(7) = ((utf16.length >> 24) & 0xFF).toByte
    System.arraycopy(utf16, 0, rec, 8, utf16.length)
    Cfb.write(Seq("PowerPoint Document" -> rec))
  }

  /** Deterministic .xls synthesizer: SST with one uncompressed string +
    * a LABELSST cell referencing it. */
  def synthXls(text: String): Array[Byte] = {
    val utf16 = text.getBytes(StandardCharsets.UTF_16LE)
    require(text.length <= 0xFFFF, "synthXls: text too long for one SST")
    val bos = new java.io.ByteArrayOutputStream()
    def rec(tpe: Int, payload: Array[Byte]): Unit = {
      bos.write(tpe & 0xFF); bos.write((tpe >> 8) & 0xFF)
      bos.write(payload.length & 0xFF); bos.write((payload.length >> 8) & 0xFF)
      bos.write(payload)
    }
    val sst = new Array[Byte](8 + 3 + utf16.length)
    def sput32(off: Int, v: Int): Unit = (0 until 4).foreach(k =>
      sst(off + k) = ((v >> (8 * k)) & 0xFF).toByte)
    sput32(0, 1); sput32(4, 1)
    sst(8) = (text.length & 0xFF).toByte
    sst(9) = ((text.length >> 8) & 0xFF).toByte
    sst(10) = 0x01 // fHighByte: UTF-16LE
    System.arraycopy(utf16, 0, sst, 11, utf16.length)
    rec(0x00FC, sst)
    val label = new Array[Byte](10) // row=0 col=0 ixfe=0 isst=0
    rec(0x00FD, label)
    rec(0x000A, Array.emptyByteArray) // EOF
    Cfb.write(Seq("Workbook" -> bos.toByteArray))
  }

  /** Deterministic .msg synthesizer: unicode body property stream. */
  def synthMsg(text: String): Array[Byte] =
    Cfb.write(Seq("__substg1.0_1000001F" ->
      text.getBytes(StandardCharsets.UTF_16LE)))

  private val EntityRe = "&(#x[0-9a-fA-F]+|#[0-9]+|lt|gt|amp|quot|apos);".r

  def unescapeXml(s: String): String =
    if (!s.contains('&')) s
    else EntityRe.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement(
      m.group(1) match {
        case "lt" => "<"
        case "gt" => ">"
        case "amp" => "&"
        case "quot" => "\""
        case "apos" => "'"
        case e if e.startsWith("#x") =>
          new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
        case e => new String(Character.toChars(e.drop(1).toInt))
      }))
}
