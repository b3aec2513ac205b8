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

  // ---- DataFrame dispatch -------------------------------------------

  test("Parsers.parse extracts real pdf and docx content in-plan") {
    import spark.implicits._
    val files = Seq(
      ("p1", pdfWith("BT (from pdf) Tj ET"), ".pdf"),
      ("d1", docxWith("<w:document><w:p><w:t>from docx</w:t></w:p>" +
        "</w:document>"), ".docx"))
      .toDF("doc_id", "content", "extension")
    val got = Parsers.parse(files).select("doc_id", "parser", "text",
      "parse_status").collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2),
        r.getString(3))).toMap
    assert(got("p1") == (("pdf", "from pdf", "ok")))
    assert(got("d1") == (("docx", "from docx", "ok")))
  }
}
