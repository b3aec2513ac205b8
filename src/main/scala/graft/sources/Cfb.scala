package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets

/** Compound File Binary (OLE2) container: reader + minimal writer, on
  * JDK primitives only.
  *
  * CFB is the public [MS-CFB] format underneath the legacy Office
  * formats (.doc/.ppt/.xls/.msg) that the reference routes through the
  * `unstructured` library (shared/text_processing/parsers/
  * registry.py:111-225, unstructured.py:15-155). The container layer is
  * a sector allocator: a FAT of linked sector chains, a directory of
  * named streams, and a "mini stream" (64-byte mini sectors, chained
  * through a miniFAT) for streams under 4096 bytes.
  *
  * Reader scope: 512- and 4096-byte sectors, header + chained DIFAT,
  * FAT/miniFAT chains, flat name lookup over all directory entries
  * (the legacy text streams — WordDocument, 0Table, PowerPoint
  * Document, Workbook, __substg1.0_* — are root children; nested
  * storage paths are not resolved). All reads are bounds-checked; a
  * corrupt chain raises (callers surface `error:<type>`).
  *
  * Writer scope (for deterministic test/oracle fixtures, the same role
  * BinaryParsers.synthPptx plays for OOXML): root + flat streams,
  * 512-byte sectors, proper ministream placement for small streams —
  * so round-trips exercise the reader's miniFAT path with realistic
  * layout.
  */
object Cfb {

  private val Magic = Array(0xD0, 0xCF, 0x11, 0xE0, 0xA1, 0xB1, 0x1A, 0xE1)
    .map(_.toByte)
  private val FREESECT = 0xFFFFFFFF
  private val ENDOFCHAIN = 0xFFFFFFFE
  private val FATSECT = 0xFFFFFFFD
  private val MiniCutoff = 4096
  private val MiniSector = 64

  final case class Entry(name: String, objectType: Int, startSector: Int,
      size: Long, leftSib: Int = -1, rightSib: Int = -1, child: Int = -1)

  /** `streams` preserves the reader's resolution order (root children
    * first, then slot order) — it must stay a SeqMap: streamByPrefix's
    * "first match wins" contract is what stops a nested sub-storage's
    * duplicate-prefix stream (e.g. a .msg attachment body) from
    * shadowing the root one. */
  final case class Doc(entries: Seq[Entry],
                       streams: scala.collection.immutable.SeqMap[String, Array[Byte]]) {
    /** First stream whose name equals (or, for the .msg property
      * streams, starts with) `name`. */
    def stream(name: String): Option[Array[Byte]] = streams.get(name)
    def streamByPrefix(prefix: String): Option[Array[Byte]] =
      streams.collectFirst { case (n, b) if n.startsWith(prefix) => b }
  }

  def isCfb(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 8 &&
      Magic.indices.forall(i => bytes(i) == Magic(i))

  private def u16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8) |
      ((b(off + 2) & 0xFF) << 16) | ((b(off + 3) & 0xFF) << 24)
  private def i64(b: Array[Byte], off: Int): Long =
    (i32(b, off) & 0xFFFFFFFFL) | ((i32(b, off + 4) & 0xFFFFFFFFL) << 32)

  /** Parse a CFB container into its directory + stream contents. */
  def read(bytes: Array[Byte]): Doc = {
    require(isCfb(bytes), "not a CFB container")
    val sectorShift = u16(bytes, 0x1E)
    require(sectorShift == 9 || sectorShift == 12,
      s"unsupported sector shift $sectorShift")
    val sectorSize = 1 << sectorShift
    val numFatSectors = i32(bytes, 0x2C)
    val firstDirSector = i32(bytes, 0x30)
    val firstMiniFatSector = i32(bytes, 0x3C)
    val numMiniFatSectors = i32(bytes, 0x40)
    val firstDifatSector = i32(bytes, 0x44)
    val numDifatSectors = i32(bytes, 0x48)

    // [MS-CFB] 2.2: sector n starts at (n+1)<<sectorShift — the header
    // occupies the whole of "sector -1", so for v4 (4096-byte sectors)
    // sector 0 begins at offset 4096, not 512.
    def sectorOffset(sid: Int): Int = (sid + 1) * sectorSize

    // Mini Stream Cutoff Size lives in the header (offset 0x38); real
    // files always say 4096 but the spec allows otherwise.
    val miniCutoff = {
      val v = i32(bytes, 0x38)
      if (v > 0) v else MiniCutoff
    }

    // DIFAT: 109 entries in the header, then chained DIFAT sectors
    // (each holds sectorSize/4 - 1 FAT sector ids + a next pointer)
    val difat = Array.newBuilder[Int]
    (0 until 109).foreach(i => difat += i32(bytes, 0x4C + 4 * i))
    var dsid = firstDifatSector
    var dguard = 0
    while (dsid != ENDOFCHAIN && dsid != FREESECT &&
        dguard <= numDifatSectors + 2) {
      val off = sectorOffset(dsid)
      (0 until sectorSize / 4 - 1).foreach(i => difat += i32(bytes, off + 4 * i))
      dsid = i32(bytes, off + sectorSize - 4)
      dguard += 1
    }
    val fatSectors = difat.result().filter(_ != FREESECT).take(numFatSectors)

    // FAT: concatenation of the FAT sectors' int arrays
    val fat = new Array[Int](fatSectors.length * (sectorSize / 4))
    fatSectors.zipWithIndex.foreach { case (sid, k) =>
      val off = sectorOffset(sid)
      (0 until sectorSize / 4).foreach(i =>
        fat(k * (sectorSize / 4) + i) = i32(bytes, off + 4 * i))
    }

    def chain(start: Int, table: Array[Int]): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      var sid = start
      var guard = 0
      while (sid != ENDOFCHAIN && sid != FREESECT) {
        require(sid >= 0 && sid < table.length, s"chain out of range: $sid")
        require(guard <= table.length, "FAT chain cycle")
        out += sid
        sid = table(sid)
        guard += 1
      }
      out.result()
    }

    def readChain(start: Int, size: Long): Array[Byte] = {
      val sids = chain(start, fat)
      val out = new Array[Byte](math.min(size, sids.length.toLong * sectorSize).toInt)
      var pos = 0
      sids.foreach { sid =>
        val n = math.min(sectorSize, out.length - pos)
        if (n > 0) System.arraycopy(bytes, sectorOffset(sid), out, pos, n)
        pos += n
      }
      out
    }

    // directory: 128-byte entries in the dir chain. Keep the raw slot
    // indexing — sibling/child pointers are slot ids, so unused slots
    // must stay as holes, not be compacted away.
    val dirBytes = readChain(firstDirSector, Long.MaxValue >> 8)
    val rawEntries: IndexedSeq[Option[Entry]] =
      (0 until dirBytes.length / 128).map { k =>
        val off = k * 128
        val nameLen = u16(dirBytes, off + 0x40) // bytes incl. terminator
        val objType = dirBytes(off + 0x42) & 0xFF
        if (nameLen < 2 || nameLen > 64 || objType == 0) None
        else Some(Entry(
          new String(dirBytes, off, nameLen - 2, StandardCharsets.UTF_16LE),
          objType, i32(dirBytes, off + 0x74), i64(dirBytes, off + 0x78),
          i32(dirBytes, off + 0x44), i32(dirBytes, off + 0x48),
          i32(dirBytes, off + 0x4C)))
      }
    val entries = rawEntries.flatten

    val rootIdx = rawEntries.indexWhere(_.exists(_.objectType == 5))
    require(rootIdx >= 0, "no root entry")
    val root = rawEntries(rootIdx).get

    // An entry's direct children form a binary tree threaded through
    // left/right sibling ids (NOSTREAM = 0xFFFFFFFF = -1 as Int).
    // In-order walk with a cycle guard. Iterative with an explicit
    // stack: a degenerate sibling chain is as deep as the entry count
    // (Cfb.write itself emits one chain level per stream), and a
    // recursive walk would StackOverflowError — an Error, which
    // escapes the parsers' Exception handlers and kills the task.
    def childIds(startId: Int): Seq[Int] = {
      val out = Seq.newBuilder[Int]
      val seen = scala.collection.mutable.Set[Int]()
      def valid(id: Int): Boolean =
        id >= 0 && id < rawEntries.length && rawEntries(id).isDefined
      var stack = List.empty[Int]
      var cur = startId
      while ((valid(cur) && !seen(cur)) || stack.nonEmpty) {
        if (valid(cur) && !seen(cur)) {
          seen += cur
          stack = cur :: stack
          cur = rawEntries(cur).get.leftSib
        } else {
          val id = stack.head
          stack = stack.tail
          out += id
          cur = rawEntries(id).get.rightSib
        }
      }
      out.result()
    }
    val rootChildIds = childIds(root.child)

    // miniFAT + ministream (the root entry's own chain holds the data)
    val miniFatBytes =
      if (numMiniFatSectors == 0) Array.emptyByteArray
      else readChain(firstMiniFatSector,
        numMiniFatSectors.toLong * sectorSize)
    val miniFat = Array.tabulate(miniFatBytes.length / 4)(i =>
      i32(miniFatBytes, 4 * i))
    val miniStream = if (root.size > 0) readChain(root.startSector, root.size)
      else Array.emptyByteArray

    def readMiniChain(start: Int, size: Long): Array[Byte] = {
      val sids = chain(start, miniFat)
      val out = new Array[Byte](math.min(size,
        sids.length.toLong * MiniSector).toInt)
      var pos = 0
      sids.foreach { sid =>
        val n = math.min(MiniSector, out.length - pos)
        val src = sid * MiniSector
        require(src + n <= miniStream.length, "mini chain out of range")
        if (n > 0) System.arraycopy(miniStream, src, out, pos, n)
        pos += n
      }
      out
    }

    def readStream(e: Entry): Array[Byte] =
      if (e.size == 0) Array.emptyByteArray
      else if (e.size < miniCutoff) readMiniChain(e.startSector, e.size)
      else readChain(e.startSector, e.size)

    // Root-child streams first, then the rest in slot order, first name
    // wins — so a duplicate name nested in a sub-storage (e.g. a .msg
    // attachment's own __substg1.0_1000001F under __attach*) can never
    // shadow the top-level stream. If the sibling tree is corrupt the
    // walk yields fewer ids and the slot-order pass still covers all.
    val rootSet = rootChildIds.toSet
    val orderedIds =
      rootChildIds.filter(i => rawEntries(i).exists(_.objectType == 2)) ++
        rawEntries.indices.filter(i =>
          !rootSet(i) && rawEntries(i).exists(_.objectType == 2))
    val streams = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    orderedIds.foreach { i =>
      val e = rawEntries(i).get
      if (!streams.contains(e.name)) streams(e.name) = readStream(e)
    }
    // VectorMap keeps the resolution order (a plain .toMap rebuilds a
    // hash map and re-randomizes streamByPrefix's first-match)
    Doc(entries,
      scala.collection.immutable.VectorMap.from(streams))
  }

  // ------------------------------------------------------------ writer

  /** CFB directory-entry name ordering: by UTF-16 length first, then
    * case-insensitive comparison. */
  private def nameLt(a: String, b: String): Boolean =
    if (a.length != b.length) a.length < b.length
    else a.toUpperCase < b.toUpperCase

  /** Write a flat container (all streams as root children) with
    * 512-byte sectors. Streams under 4096 bytes go to the ministream,
    * like real writers, so reads exercise the miniFAT path. */
  def write(streams: Seq[(String, Array[Byte])]): Array[Byte] = {
    val sectorSize = 512
    require(streams.map(_._1).distinct.size == streams.size,
      "duplicate stream names")
    streams.foreach { case (n, _) =>
      require(n.length <= 31, s"stream name too long: $n") }

    def pad(b: Array[Byte], unit: Int): Array[Byte] =
      if (b.length % unit == 0) b
      else b ++ new Array[Byte](unit - b.length % unit)

    val small = streams.filter(_._2.length < MiniCutoff)
    val big = streams.filter(_._2.length >= MiniCutoff)

    // ministream: small streams padded to 64-byte mini sectors
    var nextMini = 0
    val miniStarts = scala.collection.mutable.Map[String, Int]()
    val miniData = new java.io.ByteArrayOutputStream()
    val miniFat = Array.newBuilder[Int]
    small.foreach { case (name, data) =>
      if (data.isEmpty) miniStarts(name) = ENDOFCHAIN
      else {
        miniStarts(name) = nextMini
        val nsec = (data.length + MiniSector - 1) / MiniSector
        miniData.write(pad(data, MiniSector))
        (0 until nsec).foreach { i =>
          miniFat += (if (i == nsec - 1) ENDOFCHAIN else nextMini + i + 1)
        }
        nextMini += nsec
      }
    }
    val miniStreamBytes = miniData.toByteArray
    val miniFatInts = miniFat.result()
    val miniFatBytes = {
      val padded = pad(miniFatInts.flatMap(v => Array(
        (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)), sectorSize)
      // fill the tail with FREESECT
      var i = miniFatInts.length * 4
      while (i < padded.length) { padded(i) = 0xFF.toByte; i += 1 }
      padded
    }

    // directory entries: Root + streams, right-sibling chain in CFB
    // name order (a degenerate but valid binary search tree)
    val ordered = streams.map(_._1).sortWith(nameLt)
    val dirCount = 1 + ordered.size
    val dirSectors = (dirCount * 128 + sectorSize - 1) / sectorSize

    // sector layout: [dir][miniFAT][ministream][big data][FAT]
    val miniFatSectors = miniFatBytes.length / sectorSize
    val miniStreamPadded = pad(miniStreamBytes, sectorSize)
    val miniStreamSectors = miniStreamPadded.length / sectorSize
    val bigPadded = big.map { case (n, d) => n -> pad(d, sectorSize) }
    val bigSectors = bigPadded.map(_._2.length / sectorSize).sum

    val dataSectors = dirSectors + miniFatSectors + miniStreamSectors +
      bigSectors
    // FAT sectors also occupy FAT slots; iterate to fixpoint
    var fatSectors = 1
    while ((dataSectors + fatSectors) * 4 > fatSectors * sectorSize)
      fatSectors += 1
    val totalSectors = dataSectors + fatSectors

    val dirStart = 0
    val miniFatStart = dirStart + dirSectors
    val miniStreamStart = miniFatStart + miniFatSectors
    val bigStart = miniStreamStart + miniStreamSectors
    val fatStart = bigStart + bigSectors

    val bigStarts = scala.collection.mutable.Map[String, Int]()
    var cursor = bigStart
    bigPadded.foreach { case (name, padded) =>
      bigStarts(name) = cursor
      cursor += padded.length / sectorSize
    }

    val fat = Array.fill(fatSectors * (sectorSize / 4))(FREESECT)
    def chainInto(start: Int, nsec: Int): Unit =
      (0 until nsec).foreach { i =>
        fat(start + i) = if (i == nsec - 1) ENDOFCHAIN else start + i + 1
      }
    chainInto(dirStart, dirSectors)
    if (miniFatSectors > 0) chainInto(miniFatStart, miniFatSectors)
    if (miniStreamSectors > 0) chainInto(miniStreamStart, miniStreamSectors)
    bigPadded.foreach { case (name, padded) =>
      chainInto(bigStarts(name), padded.length / sectorSize) }
    (0 until fatSectors).foreach(i => fat(fatStart + i) = FATSECT)

    // directory bytes
    val dir = ByteBuffer.allocate(dirSectors * sectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    def putEntry(name: String, objType: Int, leftSib: Int, rightSib: Int,
                 child: Int, start: Int, size: Long): Unit = {
      val base = dir.position()
      val utf16 = name.getBytes(StandardCharsets.UTF_16LE)
      dir.put(utf16)
      dir.position(base + 0x40)
      dir.putShort((utf16.length + 2).toShort)
      dir.put(objType.toByte)
      dir.put(1.toByte) // black
      dir.putInt(leftSib)
      dir.putInt(rightSib)
      dir.putInt(child)
      dir.position(base + 0x74)
      dir.putInt(start)
      dir.putLong(size)
      dir.position(base + 128)
    }
    val NoStream = 0xFFFFFFFF
    val idOf = ordered.zipWithIndex.map { case (n, i) => n -> (i + 1) }.toMap
    putEntry("Root Entry", 5, NoStream, NoStream,
      if (ordered.isEmpty) NoStream else idOf(ordered.head),
      if (miniStreamBytes.isEmpty) ENDOFCHAIN else miniStreamStart,
      miniStreamBytes.length.toLong)
    val byName = streams.toMap
    ordered.zipWithIndex.foreach { case (name, i) =>
      val data = byName(name)
      val start =
        if (data.isEmpty) ENDOFCHAIN
        else if (data.length < MiniCutoff) miniStarts(name)
        else bigStarts(name)
      val right = if (i + 1 < ordered.size) idOf(ordered(i + 1)) else NoStream
      putEntry(name, 2, NoStream, right, NoStream, start, data.length.toLong)
    }
    // unused tail entries: leave zeroed (objectType 0 = unused)

    // header
    val header = ByteBuffer.allocate(512).order(ByteOrder.LITTLE_ENDIAN)
    header.put(Magic)
    header.position(0x18)
    header.putShort(0x003E.toShort) // minor version
    header.putShort(0x0003.toShort) // major version 3 (512 B sectors)
    header.putShort(0xFFFE.toShort) // little-endian marker
    header.putShort(9.toShort)      // sector shift
    header.putShort(6.toShort)      // mini sector shift
    header.position(0x2C)
    header.putInt(fatSectors)
    header.putInt(dirStart)
    header.putInt(0)                // transaction signature
    header.putInt(MiniCutoff)
    header.putInt(if (miniFatSectors > 0) miniFatStart else ENDOFCHAIN)
    header.putInt(miniFatSectors)
    header.putInt(ENDOFCHAIN)       // no DIFAT chain (109 slots suffice)
    header.putInt(0)
    require(fatSectors <= 109, "file too large for header-only DIFAT")
    (0 until 109).foreach(i =>
      header.putInt(if (i < fatSectors) fatStart + i else FREESECT))

    val out = ByteBuffer.allocate(512 + totalSectors * sectorSize)
    out.put(header.array())
    out.put(dir.array())
    out.put(miniFatBytes)
    out.put(miniStreamPadded)
    bigPadded.foreach { case (_, p) => out.put(p) }
    val fatBytes = ByteBuffer.allocate(fatSectors * sectorSize)
      .order(ByteOrder.LITTLE_ENDIAN)
    fat.foreach(fatBytes.putInt)
    out.put(fatBytes.array())
    out.array()
  }
}
