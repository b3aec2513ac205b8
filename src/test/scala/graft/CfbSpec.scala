package graft

import java.nio.charset.StandardCharsets

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{BinaryParsers, Cfb}

/** The CFB (OLE2 compound file) container and the legacy-format
  * extractors built on it (.doc/.ppt/.xls/.msg — SURVEY §2.1 S8's
  * last stubbed registry rows). */
class CfbSpec extends AnyFunSuite {

  test("CFB write/read round-trip: ministream and regular streams") {
    val small = "tiny payload".getBytes(StandardCharsets.UTF_8)
    val big = Array.tabulate[Byte](9000)(i => (i % 251).toByte)
    val mid = Array.tabulate[Byte](4096)(i => (i % 13).toByte) // at cutoff
    val bytes = Cfb.write(Seq(
      "SmallStream" -> small, "BigStream" -> big, "EdgeStream" -> mid))
    assert(Cfb.isCfb(bytes))
    val doc = Cfb.read(bytes)
    assert(doc.stream("SmallStream").map(_.toSeq).contains(small.toSeq),
      "sub-4096 stream must round-trip through the ministream")
    assert(doc.stream("BigStream").map(_.toSeq).contains(big.toSeq))
    assert(doc.stream("EdgeStream").map(_.toSeq).contains(mid.toSeq),
      "a stream exactly at the 4096 cutoff uses the regular FAT")
    assert(doc.stream("Missing").isEmpty)
  }

  test("CFB: empty stream and many-small-streams layout") {
    val streams = ("Empty" -> Array.emptyByteArray) +:
      (0 until 20).map(i =>
        s"S$i" -> s"payload number $i".getBytes(StandardCharsets.UTF_8))
    val doc = Cfb.read(Cfb.write(streams))
    assert(doc.stream("Empty").exists(_.isEmpty))
    (0 until 20).foreach { i =>
      assert(doc.stream(s"S$i").map(new String(_, StandardCharsets.UTF_8))
        .contains(s"payload number $i"))
    }
  }

  test("CFB v4 (4096-byte sectors): sector 0 starts at offset 4096") {
    // Hand-built minimal v4 container ([MS-CFB] 2.2: sector n is at
    // (n+1)<<sectorShift, so with shift 12 the header zone spans the
    // whole first 4096 bytes). Layout: sector0=FAT sector1=dir
    // sectors2,3=stream data.
    val ss = 4096
    val payload = Array.tabulate[Byte](5000)(i => (i * 7 % 251).toByte)
    val buf = java.nio.ByteBuffer.allocate(ss + 4 * ss)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put(Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
      .map(_.toByte))
    buf.position(0x18)
    buf.putShort(0x3E.toShort); buf.putShort(4.toShort) // major version 4
    buf.putShort(0xFFFE.toShort)
    buf.putShort(12.toShort); buf.putShort(6.toShort)   // sector shifts
    buf.position(0x2C)
    buf.putInt(1)           // FAT sectors
    buf.putInt(1)           // first dir sector
    buf.putInt(0)           // transaction
    buf.putInt(4096)        // mini stream cutoff
    buf.putInt(-2); buf.putInt(0) // no miniFAT
    buf.putInt(-2); buf.putInt(0) // no DIFAT chain
    buf.putInt(0)           // DIFAT[0] -> FAT at sector 0
    (1 until 109).foreach(_ => buf.putInt(-1))
    // FAT (sector 0 @ 4096): 0=FATSECT, 1=dir end, 2->3->end
    buf.position(ss)
    buf.putInt(0xFFFFFFFD); buf.putInt(-2); buf.putInt(3); buf.putInt(-2)
    (4 until ss / 4).foreach(_ => buf.putInt(-1))
    // directory (sector 1 @ 8192)
    def putEntry(slot: Int, name: String, objType: Int, left: Int,
                 right: Int, child: Int, start: Int, size: Long): Unit = {
      val base = 2 * ss + slot * 128
      val utf16 = name.getBytes(StandardCharsets.UTF_16LE)
      buf.position(base); buf.put(utf16)
      buf.position(base + 0x40)
      buf.putShort((utf16.length + 2).toShort)
      buf.put(objType.toByte); buf.put(1.toByte)
      buf.putInt(left); buf.putInt(right); buf.putInt(child)
      buf.position(base + 0x74); buf.putInt(start); buf.putLong(size)
    }
    putEntry(0, "Root Entry", 5, -1, -1, 1, -2, 0L)
    putEntry(1, "BigV4", 2, -1, -1, -1, 2, payload.length.toLong)
    buf.position(3 * ss); buf.put(payload)
    val doc = Cfb.read(buf.array())
    assert(doc.stream("BigV4").map(_.toSeq).contains(payload.toSeq),
      "v4 sector addressing must be (sid+1)*4096, not 512+sid*4096")
  }

  test("CFB: root-child stream wins over a same-named orphan/nested one") {
    // Write two root streams, rename both to one name, and detach the
    // second from the root sibling chain — simulating a .msg where an
    // attachment's __substg1.0_1000001F lives in a sub-storage. The
    // reader must surface the root-child stream, not the detached one.
    val topBody = "top-level body".getBytes(StandardCharsets.UTF_8)
    val attach = "attachment body".getBytes(StandardCharsets.UTF_8)
    // CFB name order is A then B, so slot1=A (root.child), slot2=B
    val bytes = Cfb.write(Seq("A" -> topBody, "B" -> attach))
    val name = "DupStream".getBytes(StandardCharsets.UTF_16LE)
    def rename(slot: Int): Unit = {
      val base = 512 + 128 * slot
      java.util.Arrays.fill(bytes, base, base + 0x40, 0.toByte)
      System.arraycopy(name, 0, bytes, base, name.length)
      bytes(base + 0x40) = ((name.length + 2) & 0xFF).toByte
      bytes(base + 0x41) = 0.toByte
    }
    rename(1); rename(2)
    // A.rightSib = NOSTREAM: B becomes unreachable from the root tree
    (0 until 4).foreach(i => bytes(512 + 128 + 0x48 + i) = 0xFF.toByte)
    val doc = Cfb.read(bytes)
    assert(doc.stream("DupStream")
      .map(new String(_, StandardCharsets.UTF_8)).contains("top-level body"),
      "root-child stream must shadow duplicates outside the root tree")
  }

  test("CFB: a deep sibling chain parses without stack overflow") {
    // Cfb.write threads root children as one sibling chain level per
    // stream — thousands of streams = a recursion-depth-sized chain;
    // the tree walk must be iterative or real containers kill the task
    // with a StackOverflowError (an Error, invisible to the parsers'
    // Exception handlers).
    val n = 20000
    val streams = (0 until n).map(i => (f"S$i%05d", s"v$i".getBytes))
    val doc = Cfb.read(Cfb.write(streams))
    assert(doc.streams.size == n)
    assert(doc.stream("S00000").map(new String(_)).contains("v0"))
    assert(doc.stream(f"S${n - 1}%05d").map(new String(_)).contains(s"v${n - 1}"))
  }

  test("CFB reader rejects non-CFB bytes") {
    assert(!Cfb.isCfb("plain text".getBytes))
    intercept[IllegalArgumentException](Cfb.read("plain text".getBytes))
  }

  test(".doc: piece-table extraction round-trips text (ministream FIB)") {
    val text = "Legacy Word file with several words. And two sentences.\n" +
      "Second paragraph line."
    val r = BinaryParsers.parse(BinaryParsers.synthDoc(text), "doc")
    assert(r.status == "ok")
    assert(r.text == text)
  }

  test(".doc: Word control chars map to text (para/cell marks, fields)") {
    // para mark 0x0D -> \n, cell mark 0x07 -> \n, field chars dropped
    val raw = "cell a\u0007cell b\rnext para\u0013FIELD\u0014shown" +
      "\u0015end"
    val r = BinaryParsers.parse(BinaryParsers.synthDoc(raw), "doc")
    assert(r.status == "ok")
    assert(r.text == "cell a\ncell b\nnext paraFIELDshownend")
  }

  test(".doc: unicode piece (UTF-16) via a hand-built CLX") {
    // build a WordDocument with one UNCOMPRESSED piece to cover the
    // UTF-16 decode branch the compressed synthesizer skips
    val text = "café – unicode"
    val utf16 = text.getBytes(StandardCharsets.UTF_16LE)
    val fibSize = 1024
    val wd = new Array[Byte](fibSize + utf16.length)
    def put16(off: Int, v: Int): Unit = {
      wd(off) = (v & 0xFF).toByte; wd(off + 1) = ((v >> 8) & 0xFF).toByte }
    put16(0, 0xA5EC); put16(2, 0x00C1)
    System.arraycopy(utf16, 0, wd, fibSize, utf16.length)
    val n = 1
    val plcLen = 4 * (n + 1) + 8 * n
    val clx = new Array[Byte](5 + plcLen)
    clx(0) = 0x02
    def cput32(off: Int, v: Int): Unit = (0 until 4).foreach(k =>
      clx(off + k) = ((v >> (8 * k)) & 0xFF).toByte)
    cput32(1, plcLen)
    cput32(5, 0); cput32(9, text.length)
    cput32(5 + 8 + 2, fibSize) // no compressed bit: fc is a byte offset
    put16(0x01A2, 0); put16(0x01A4, 0)
    put16(0x01A6, clx.length & 0xFFFF); put16(0x01A8, clx.length >> 16)
    val r = BinaryParsers.parse(
      Cfb.write(Seq("WordDocument" -> wd, "0Table" -> clx)), "doc")
    assert(r.status == "ok")
    assert(r.text == text)
  }

  test(".ppt: TextCharsAtom extraction round-trips text") {
    val text = "Slide title text with words"
    val r = BinaryParsers.parse(BinaryParsers.synthPpt(text), "ppt")
    assert(r.status == "ok")
    assert(r.text == text)
  }

  test(".xls: SST + LABELSST extraction round-trips text") {
    val text = "spreadsheet cell text value"
    val r = BinaryParsers.parse(BinaryParsers.synthXls(text), "xls")
    assert(r.status == "ok")
    assert(r.text == text)
  }

  test(".msg: unicode body property stream round-trips text") {
    val text = "Outlook message body\nwith two lines"
    val r = BinaryParsers.parse(BinaryParsers.synthMsg(text), "msg")
    assert(r.status == "ok")
    assert(r.text == text)
  }

  test("legacy extractors reject wrong containers with typed statuses") {
    val notOle = "garbage".getBytes
    assert(BinaryParsers.parse(notOle, "doc").status == "error:not_ole")
    assert(BinaryParsers.parse(notOle, "ppt").status == "error:not_ole")
    assert(BinaryParsers.parse(notOle, "xls").status == "error:not_ole")
    assert(BinaryParsers.parse(notOle, "msg").status == "error:not_ole")
    // a valid CFB without the expected stream
    val cfb = Cfb.write(Seq("SomethingElse" -> "x".getBytes))
    assert(BinaryParsers.parse(cfb, "doc").status == "error:no_worddocument")
    assert(BinaryParsers.parse(cfb, "msg").status == "error:no_body")
  }
}
