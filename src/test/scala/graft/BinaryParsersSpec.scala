package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.sources.{BinaryParsers, Parsers}

class BinaryParsersSpec extends SparkSpec {

  // ---- fixtures ------------------------------------------------------

  /** Minimal single-stream PDF around a given content stream. */
  private def pdfWith(stream: String, flate: Boolean = false): Array[Byte] = {
    val body =
      if (flate) {
        val d = new Deflater()
        d.setInput(stream.getBytes(ISO_8859_1)); d.finish()
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) out.write(buf, 0, d.deflate(buf))
        out.toByteArray
      } else stream.getBytes(ISO_8859_1)
    val filter = if (flate) " /Filter /FlateDecode" else ""
    val out = new ByteArrayOutputStream()
    out.write(s"%PDF-1.4\n1 0 obj\n<< /Length ${body.length}$filter >>\nstream\n"
      .getBytes(ISO_8859_1))
    out.write(body)
    out.write("\nendstream\nendobj\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  /** Minimal docx: zip with word/document.xml holding given paragraphs. */
  private def docxWith(documentXml: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes(UTF_8)); z.closeEntry()
    z.putNextEntry(new ZipEntry("word/document.xml"))
    z.write(documentXml.getBytes(UTF_8)); z.closeEntry()
    z.close()
    out.toByteArray
  }

  // ---- PDF -----------------------------------------------------------

  test("pdf: Tj / quote / TJ-array / hex strings across lines") {
    val stream = "BT /F1 12 Tf 72 720 Td (Hello graft) Tj " +
      "0 -14 Td (second line) Tj " +
      "[(kerned) -250 (array)] TJ T* (third) ' <2074657874> Tj ET"
    val got = BinaryParsers.pdf(pdfWith(stream))
    assert(got.status == "ok")
    assert(got.text ==
      "Hello graft\nsecond linekernedarray\nthird text")
  }

  test("pdf: FlateDecode stream decodes identically to raw") {
    val stream = "BT (compressed payload) Tj ET"
    val raw = BinaryParsers.pdf(pdfWith(stream))
    val flate = BinaryParsers.pdf(pdfWith(stream, flate = true))
    assert(raw.status == "ok" && flate.status == "ok")
    assert(raw.text == flate.text && raw.text == "compressed payload")
  }

  test("pdf: literal-string escapes, nesting and octal round-trip") {
    val stream = "BT (par\\(en\\)s \\\\back (nested) \\101\\12) Tj ET"
    val got = BinaryParsers.pdf(pdfWith(stream))
    assert(got.text == "par(en)s \\back (nested) A\n")
  }

  test("pdf: /Length delimits a body containing the word endstream") {
    val stream = "BT (contains endstream inside) Tj ET"
    val got = BinaryParsers.pdf(pdfWith(stream))
    assert(got.text == "contains endstream inside")
  }

  test("pdf: utf-8 bytes in shown strings re-decode") {
    val stream = "BT (cafÃ©) Tj ET" // 'café' as utf-8 octets
    assert(BinaryParsers.pdf(pdfWith(stream)).text == "café")
  }

  test("pdf: not-a-pdf and empty inputs get typed statuses") {
    assert(BinaryParsers.pdf("plain text".getBytes(UTF_8)).status ==
      "error:not_pdf")
    assert(BinaryParsers.parse(Array.emptyByteArray, "pdf").status ==
      "error:empty")
    assert(BinaryParsers.pdf("%PDF-1.4 no streams".getBytes(UTF_8)).status ==
      "empty")
  }

  // ---- DOCX ----------------------------------------------------------

  test("docx: paragraphs, tabs, breaks and entities extract in order") {
    val xml = """<?xml version="1.0"?><w:document><w:body>""" +
      """<w:p><w:r><w:t>Title &amp; intro</w:t></w:r></w:p>""" +
      """<w:p><w:r><w:t xml:space="preserve">a&lt;b</w:t><w:tab/>""" +
      """<w:t>c&#x41;d</w:t><w:br/><w:t>tail</w:t></w:r></w:p>""" +
      """</w:body></w:document>"""
    val got = BinaryParsers.docx(docxWith(xml))
    assert(got.status == "ok")
    assert(got.text == "Title & intro\na<b\tcAd\ntail")
  }

  test("docx: zip without document.xml vs non-zip bytes") {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("other.xml")); z.write(1); z.closeEntry()
    z.close()
    assert(BinaryParsers.docx(out.toByteArray).status ==
      "error:no_document_xml")
    assert(BinaryParsers.docx("garbage".getBytes(UTF_8)).status ==
      "error:not_docx")
  }

  // ---- PPTX ----------------------------------------------------------

  /** Minimal pptx: zip with the given (already-numbered) slide XMLs. */
  private def pptxWith(slides: (String, String)*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val z = new ZipOutputStream(out)
    z.putNextEntry(new ZipEntry("[Content_Types].xml"))
    z.write("<Types/>".getBytes(UTF_8)); z.closeEntry()
    slides.foreach { case (name, xml) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(xml.getBytes(UTF_8)); z.closeEntry()
    }
    z.close()
    out.toByteArray
  }

  test("pptx: slides sort numerically, runs join, breaks newline") {
    // slide10 in the archive BEFORE slide2: numeric sort must win
    val bytes = pptxWith(
      "ppt/slides/slide10.xml" ->
        "<p:sld><a:p><a:r><a:t>last slide</a:t></a:r></a:p></p:sld>",
      "ppt/slides/slide2.xml" ->
        ("<p:sld><a:p><a:r><a:t>two </a:t></a:r><a:r><a:t>runs</a:t>" +
          "</a:r></a:p><a:p><a:r><a:t>with</a:t><a:br/>" +
          "<a:t>break &amp; entity</a:t></a:r></a:p></p:sld>"))
    val got = BinaryParsers.pptx(bytes)
    assert(got.status == "ok")
    assert(got.text == "two runs\nwith\nbreak & entity\nlast slide")
  }

  test("pptx: typed statuses for non-zip / no slides") {
    assert(BinaryParsers.pptx("garbage".getBytes(UTF_8)).status ==
      "error:not_pptx")
    assert(BinaryParsers.pptx(docxWith("<w:document/>")).status ==
      "error:no_slides")
  }

  test("pptx: synthPptx round-trips text exactly") {
    val text = "line one <with> & markup\nline two\ttabbed"
    val got = BinaryParsers.pptx(BinaryParsers.synthPptx(text))
    assert(got.status == "ok" && got.text == text)
  }

  // ---- XLSX ----------------------------------------------------------

  test("xlsx: shared strings, inline strings and numbers by row") {
    val shared = "<sst><si><t>alpha</t></si>" +
      "<si><r><t>ri</t></r><r><t>ch</t></r></si></sst>"
    val sheet1 = """<worksheet><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c>""" +
      """<c r="B1" t="s"><v>1</v></c><c r="C1"><v>42</v></c></row>""" +
      """<row r="2"><c r="A2" t="inlineStr"><is><t>in&lt;line</t></is>""" +
      """</c><c r="B2"/></row>""" +
      """</sheetData></worksheet>"""
    val sheet2 = """<worksheet><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>99</v></c></row>""" + // bad index
      """<row r="2"><c r="A2"><v>7</v></c></row>""" +
      """</sheetData></worksheet>"""
    val bytes = pptxWith( // any zip-maker works for the xlsx layout too
      "xl/sharedStrings.xml" -> shared,
      "xl/worksheets/sheet1.xml" -> sheet1,
      "xl/worksheets/sheet2.xml" -> sheet2)
    val got = BinaryParsers.xlsx(bytes)
    assert(got.status == "ok")
    // bad shared index → empty cell; row of only-empty cells dropped
    assert(got.text == "alpha\trich\t42\nin<line\t\n7")
  }

  test("xlsx: typed statuses for non-zip / no sheets") {
    assert(BinaryParsers.xlsx("garbage".getBytes(UTF_8)).status ==
      "error:not_xlsx")
    assert(BinaryParsers.xlsx(docxWith("<w:document/>")).status ==
      "error:no_sheets")
  }

  test("xlsx: synthXlsx round-trips text exactly") {
    val text = "cell <text> & stuff\nsecond line"
    val got = BinaryParsers.xlsx(BinaryParsers.synthXlsx(text))
    assert(got.status == "ok" && got.text == text)
  }

  // ---- DataFrame dispatch -------------------------------------------

  test("Parsers.parse extracts real pdf/docx/pptx/xlsx content in-plan") {
    import spark.implicits._
    val files = Seq(
      ("p1", pdfWith("BT (from pdf) Tj ET"), ".pdf"),
      ("d1", docxWith("<w:document><w:p><w:t>from docx</w:t></w:p>" +
        "</w:document>"), ".docx"),
      ("s1", BinaryParsers.synthPptx("from pptx"), ".pptx"),
      ("x1", BinaryParsers.synthXlsx("from xlsx"), ".xlsx"))
      .toDF("doc_id", "content", "extension")
    val got = Parsers.parse(files).select("doc_id", "parser", "text",
      "parse_status").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2),
        r.getString(3))).toMap
    assert(got("p1") == (("pdf", "from pdf", "ok")))
    assert(got("d1") == (("docx", "from docx", "ok")))
    assert(got("s1") == (("pptx", "from pptx", "ok")))
    assert(got("x1") == (("xlsx", "from xlsx", "ok")))
  }
}
