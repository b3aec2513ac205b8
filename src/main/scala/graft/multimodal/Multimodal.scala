package graft.multimodal

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Multimodal columns for training-data pipelines: image/audio/video as
  * opaque `binary` columns with typed metadata, plus decode /
  * feature-extract / resize / frame-sample operators.
  *
  * The Spark-side plumbing — schema, batched per-partition processing,
  * operator signatures, output shapes — is real and tested. The codec
  * work itself is STUBBED behind [[MediaCodec]]: this container ships
  * no image/audio libraries, so the default codec is a clearly-marked
  * deterministic fake that derives every "decoded" property from the
  * SHA-256 of the bytes. Swapping in a real JVM codec (or a Python
  * `mapInPandas` stage on a PySpark cluster) changes ONLY the codec
  * implementation; every plan shape stays identical.
  *
  * Scale posture: all operators are mapPartitions-style narrow ops over
  * the binary column — batch-friendly, shuffle-free; frame sampling is
  * the only row-multiplying op and is bounded by maxFrames.
  */
object Multimodal {

  /** Typed media metadata (FIXTURES-style struct). */
  final case class MediaMeta(width: Int, height: Int, channels: Int,
      sampleRateHz: Int, durationMs: Long, codec: String)

  final case class MediaRow(doc_id: String, media_type: String,
      content: Array[Byte])
  final case class DecodedRow(doc_id: String, media_type: String,
      content: Array[Byte], width: Int, height: Int, channels: Int,
      sample_rate_hz: Int, duration_ms: Long, codec: String)
  final case class FrameRow(doc_id: String, frame_index: Int,
      timestamp_ms: Long, frame_hash: String)
  final case class FeatureRow(doc_id: String, media_type: String,
      feature: Array[Float])

  /** The pluggable codec boundary. Implementations MUST be
    * deterministic for reproducible pipelines. */
  trait MediaCodec extends Serializable {
    def decode(mediaType: String, bytes: Array[Byte]): MediaMeta
    /** Derives the source metadata itself — one decode per row, not a
      * decode-for-meta plus a decode-for-pixels. */
    def resize(mediaType: String, bytes: Array[Byte], w: Int,
               h: Int): (MediaMeta, Array[Byte])
    def extractFeature(mediaType: String, bytes: Array[Byte],
                       dim: Int): Array[Float]
    /** Frame sampling: one (frameIndex, timestampMs, frameHash) per
      * `everyMs` tick, capped at `maxFrames`. The default derives
      * timing from [[decode]] metadata and hashes the container bytes
      * per tick — the stub path for formats with no in-JVM frame
      * decoder; a codec with real multi-frame access overrides it with
      * per-frame pixel checksums (see JdkCodec's animated-GIF path). */
    def sampleFrames(mediaType: String, bytes: Array[Byte], everyMs: Long,
                     maxFrames: Int): Seq[(Int, Long, String)] = {
      val meta = decode(mediaType, bytes)
      val n = math.min(maxFrames,
        math.max(0L, meta.durationMs / math.max(1L, everyMs)).toInt)
      (0 until n).map { i =>
        val ts = i * everyMs
        val fh = MessageDigest.getInstance("SHA-256")
          .digest(bytes ++ s"frame:$ts".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
        (i, ts, fh)
      }
    }
  }

  /** STUB codec — deterministic fake (no media libs in this build).
    * Every property is a pure function of sha256(bytes); real decoders
    * drop in behind the same trait. */
  object FakeCodec extends MediaCodec {
    private def h(bytes: Array[Byte]): Array[Byte] =
      MessageDigest.getInstance("SHA-256").digest(bytes)

    override def decode(mediaType: String, bytes: Array[Byte]): MediaMeta = {
      val d = h(bytes)
      def u(i: Int) = ((d(i) & 0xff) << 8) | (d(i + 1) & 0xff)
      mediaType match {
        case "image" =>
          MediaMeta(64 + u(0) % 4032, 64 + u(2) % 2096, 3, 0, 0, "fake/png")
        case "audio" =>
          MediaMeta(0, 0, 1 + u(0) % 2, 8000 + (u(2) % 5) * 8000,
            1000L + u(4) % 600000, "fake/wav")
        case "video" =>
          MediaMeta(64 + u(0) % 1856, 64 + u(2) % 1016, 3, 44100,
            1000L + u(4) % 600000, "fake/mp4")
        case _ => MediaMeta(0, 0, 0, 0, bytes.length.toLong, "fake/bin")
      }
    }

    override def resize(mediaType: String, bytes: Array[Byte], w: Int,
                        hgt: Int): (MediaMeta, Array[Byte]) =
      (decode(mediaType, bytes).copy(width = w, height = hgt),
        h(bytes ++ s"resize:${w}x$hgt".getBytes("UTF-8")))

    override def extractFeature(mediaType: String, bytes: Array[Byte],
                                dim: Int): Array[Float] = {
      val hex = h(bytes).map("%02x".format(_)).mkString
      TextFunctions.mockEmbedding(s"$mediaType:$hex", dim)
    }
  }

  /** REAL codec for every format the bare JDK ships a decoder for:
    * images via `javax.imageio` (PNG/JPEG/GIF/BMP/WBMP), audio via
    * `javax.sound.sampled` (WAV/AIFF/AU). Video stays a typed failure —
    * the JDK has no built-in video decoder — so callers route those
    * rows to an external codec or the declared [[FakeCodec]] stub;
    * "stubbed codec" now means ONLY the formats the JVM genuinely
    * lacks. Everything here is deterministic: resize is explicit
    * nearest-neighbor raster arithmetic (no AWT rendering hints),
    * features are pure pixel/PCM arithmetic, and ImageIO's PNG writer
    * emits no timestamp chunks. */
  object JdkCodec extends MediaCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO
    import javax.sound.sampled.AudioSystem

    private def sniff(b: Array[Byte]): String =
      if (b.length >= 2 && (b(0) & 0xff) == 0x89 && b(1) == 'P'.toByte) "png"
      else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) "jpeg"
      else if (b.length >= 3 && b(0) == 'G'.toByte && b(1) == 'I'.toByte &&
        b(2) == 'F'.toByte) "gif"
      else if (b.length >= 2 && b(0) == 'B'.toByte && b(1) == 'M'.toByte) "bmp"
      else "bin"

    // Reader/writer service providers resolved from the IIORegistry
    // ONCE per format per JVM: `ImageIO.read`/`ImageIO.write` walk the
    // provider registry (calling canDecodeInput on each candidate) for
    // EVERY image, which is pure per-row overhead inside a hot Spark
    // task loop — the format is already known from the magic bytes.
    private val readerSpis =
      new java.util.concurrent.ConcurrentHashMap[String, javax.imageio.spi.ImageReaderSpi]()
    private def readerSpiFor(fmt: String): javax.imageio.spi.ImageReaderSpi =
      readerSpis.computeIfAbsent(fmt, f => {
        val it = ImageIO.getImageReadersByFormatName(f)
        require(it.hasNext, s"JdkCodec: no ImageIO reader for format $f")
        it.next().getOriginatingProvider
      })
    private lazy val pngWriterSpi: javax.imageio.spi.ImageWriterSpi = {
      val it = ImageIO.getImageWritersByFormatName("png")
      require(it.hasNext, "JdkCodec: no ImageIO PNG writer installed")
      it.next().getOriginatingProvider
    }

    // explicit memory-cache streams: ImageIO's default useCache=true
    // would create+delete a temp FILE per read/write — per-row disk
    // I/O inside Spark tasks for a pure in-memory byte round-trip
    private def readImage(bytes: Array[Byte]): BufferedImage = {
      val fmt = sniff(bytes)
      if (fmt == "bin") {
        // not one of the 4 magic-byte fast paths — fall back to the
        // registry walk (ImageIO.read probes every installed reader's
        // canDecodeInput), so bytes a TIFF/WEBP plugin could decode
        // still decode instead of failing on the sniff alone. The SPI
        // fast path below stays the hot loop; this walk is the
        // unknown-format slow path. Hand ImageIO an explicit
        // memory-cache stream (no temp file, no global useCache
        // toggle — that flag is a static shared across task threads);
        // ImageIO.read(ImageInputStream) closes the stream itself.
        val img = ImageIO.read(
          new javax.imageio.stream.MemoryCacheImageInputStream(
            new ByteArrayInputStream(bytes)))
        require(img != null,
          "JdkCodec: no installed ImageIO reader decodes these bytes")
        img
      } else {
        val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
          new ByteArrayInputStream(bytes))
        val reader = readerSpiFor(fmt).createReaderInstance()
        try {
          reader.setInput(iis, true, true)
          reader.read(0)
        } finally { reader.dispose(); iis.close() }
      }
    }

    private def writePng(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      val writer = pngWriterSpi.createWriterInstance()
      try { writer.setOutput(ios); writer.write(img); ios.flush() }
      finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    override def decode(mediaType: String, bytes: Array[Byte]): MediaMeta =
      mediaType match {
        case "image" =>
          val img = readImage(bytes)
          MediaMeta(img.getWidth, img.getHeight,
            img.getColorModel.getNumComponents, 0, 0, sniff(bytes))
        case "audio" =>
          val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
          try {
            val fmt = in.getFormat
            val durMs =
              if (in.getFrameLength >= 0 && fmt.getFrameRate > 0)
                (in.getFrameLength * 1000.0 / fmt.getFrameRate).toLong
              else 0L
            MediaMeta(0, 0, fmt.getChannels, fmt.getSampleRate.toInt, durMs,
              "pcm")
          } finally in.close()
        case other => throw new IllegalArgumentException(
          s"JdkCodec: no JVM built-in decoder for media_type=$other " +
            "(video needs an external MediaCodec)")
      }

    /** Explicit nearest-neighbor resample: out(x,y) = src(x·sw/w, y·sh/h)
      * with integer division — bit-reproducible across JVMs, unlike
      * Graphics2D scaling under rendering hints. Gray sources stay
      * single-band; everything else goes through packed RGB. */
    override def resize(mediaType: String, bytes: Array[Byte], w: Int,
                        h: Int): (MediaMeta, Array[Byte]) = {
      require(mediaType == "image",
        s"JdkCodec: resize supports images only, got $mediaType")
      val src = readImage(bytes)
      val sw = src.getWidth
      val sh = src.getHeight
      val gray = src.getColorModel.getNumComponents == 1
      val out = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val sx = x * sw / w
          val sy = y * sh / h
          if (gray) out.getRaster.setSample(x, y, 0,
            src.getRaster.getSample(sx, sy, 0))
          else out.setRGB(x, y, src.getRGB(sx, sy))
          x += 1
        }
        y += 1
      }
      (MediaMeta(w, h, out.getColorModel.getNumComponents, 0, 0, "png"),
        writePng(out))
    }

    /** Image: luminance pooled over a ⌈√dim⌉×⌈√dim⌉ grid (row-major,
      * first `dim` cells), scaled by 1/256 — a power of two, so every
      * feature value k/(cell·256) is exact in Float AND in the oracle's
      * double arithmetic. Audio: per-window RMS over the PCM stream. */
    override def extractFeature(mediaType: String, bytes: Array[Byte],
                                dim: Int): Array[Float] = mediaType match {
      case "image" =>
        val img = readImage(bytes)
        val w = img.getWidth
        val h = img.getHeight
        val gray = img.getColorModel.getNumComponents == 1
        val g = math.ceil(math.sqrt(dim.toDouble)).toInt
        val feats = new Array[Float](dim)
        var c = 0
        while (c < dim) {
          val cx = c % g
          val cy = c / g
          val x0 = cx * w / g; val x1 = math.max(x0 + 1, (cx + 1) * w / g)
          val y0 = cy * h / g; val y1 = math.max(y0 + 1, (cy + 1) * h / g)
          var sum = 0L
          var n = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val lum =
                if (gray) img.getRaster.getSample(x, y, 0)
                else {
                  val rgb = img.getRGB(x, y)
                  ((rgb >> 16 & 0xff) * 299 + (rgb >> 8 & 0xff) * 587 +
                    (rgb & 0xff) * 114) / 1000
                }
              sum += lum; n += 1
              x += 1
            }
            y += 1
          }
          feats(c) = if (n == 0) 0f else (sum.toDouble / n / 256.0).toFloat
          c += 1
        }
        feats
      case "audio" =>
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
        try {
          val fmt = in.getFormat
          // linear PCM only, with the width/sign pairing the decode
          // below implements (16-bit signed, 8-bit unsigned — the WAV
          // conventions); u-law/A-law or signed-8-bit streams must
          // fail typed, not silently decode as the wrong amplitude
          val enc = fmt.getEncoding
          val okEnc = (fmt.getSampleSizeInBits == 16 &&
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) ||
            (fmt.getSampleSizeInBits == 8 &&
              enc == javax.sound.sampled.AudioFormat.Encoding.PCM_UNSIGNED)
          require(okEnc, s"JdkCodec: unsupported audio layout $enc/" +
            s"${fmt.getSampleSizeInBits}-bit (16-bit PCM_SIGNED or " +
            "8-bit PCM_UNSIGNED only)")
          val data = in.readAllBytes()
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val ch = fmt.getChannels
          val frameBytes = bytesPerSample * ch
          val nFrames = data.length / frameBytes
          val feats = new Array[Float](dim)
          if (nFrames == 0) return feats
          // per-frame amplitude = channel mean, honoring the stream's
          // declared endianness and width (AIFF is big-endian; 8-bit
          // WAV PCM is unsigned per the spec)
          def sampleAt(frame: Int, chan: Int): Double = {
            val off = frame * frameBytes + chan * bytesPerSample
            if (bytesPerSample == 1)
              ((data(off) & 0xff) - 128).toDouble / 128.0
            else {
              val (lo, hi) =
                if (fmt.isBigEndian) (data(off + 1), data(off))
                else (data(off), data(off + 1))
              (((hi << 8) | (lo & 0xff)).toShort).toDouble / 32768.0
            }
          }
          val win = math.max(1, nFrames / dim)
          var c = 0
          while (c < dim) {
            var sumSq = 0.0
            var n = 0
            var i = c * win
            while (i < math.min((c + 1) * win, nFrames)) {
              var s = 0.0
              var k = 0
              while (k < ch) { s += sampleAt(i, k); k += 1 }
              s /= ch
              sumSq += s * s; n += 1
              i += 1
            }
            feats(c) = if (n == 0) 0f else math.sqrt(sumSq / n).toFloat
            c += 1
          }
          feats
        } finally in.close()
      case other => throw new IllegalArgumentException(
        s"JdkCodec: no feature extractor for media_type=$other")
    }

    /** The GIF reader service provider, resolved from the IIORegistry
      * ONCE per JVM: `ImageIO.getImageReadersByFormatName` walks the
      * provider registry on every call, which is per-ROW overhead when
      * frame sampling runs inside a hot `flatMap`. */
    private def gifReaderSpi: javax.imageio.spi.ImageReaderSpi =
      readerSpiFor("gif")

    /** One frame's container-level metadata: the ImageDescriptor
      * geometry and the preceding GraphicControlExtension delay
      * (centiseconds). */
    private final case class GifFrameMeta(
        left: Int, top: Int, w: Int, h: Int, delayCs: Int)

    /** Frame metadata via a direct walk of the GIF block structure
      * (header → logical screen descriptor → extension / image-
      * descriptor blocks). Replaces per-frame
      * `reader.getImageMetadata(i).getAsTree` — building and querying
      * a DOM tree per FRAME dominated the decode loop — with a scan
      * that only skips length-prefixed sub-blocks. Pixel data still
      * comes from ImageIO ([[readGifFrames]]); this reads nothing but
      * block geometry and delays. */
    private def scanGifMeta(bytes: Array[Byte]): IndexedSeq[GifFrameMeta] = {
      // bounds-checked reads: a truncated container must surface as
      // the codec's TYPED failure, not an ArrayIndexOutOfBounds from
      // a sub-block length chain running past the buffer
      def u8(i: Int) = {
        require(i >= 0 && i < bytes.length,
          s"JdkCodec: truncated GIF (read at $i of ${bytes.length} bytes)")
        bytes(i) & 0xff
      }
      def u16(i: Int) = u8(i) | (u8(i + 1) << 8)
      require(bytes.length >= 13 && bytes(0) == 'G' && bytes(1) == 'I' &&
        bytes(2) == 'F', "JdkCodec: not a GIF container")
      var p = 13 // 6-byte header + 7-byte logical screen descriptor
      val lsdPacked = u8(10)
      if ((lsdPacked & 0x80) != 0) p += 3 * (1 << ((lsdPacked & 7) + 1))
      def skipSubBlocks(): Unit = {
        while (u8(p) != 0) p += 1 + u8(p)
        p += 1
      }
      var pendingDelay = 0
      val out = IndexedSeq.newBuilder[GifFrameMeta]
      var done = false
      while (!done && p < bytes.length) {
        u8(p) match {
          case 0x3B => done = true // trailer
          case 0x21 => // extension: label byte, then sub-blocks
            val label = u8(p + 1)
            p += 2
            // GCE payload: size(>=4), packed, delay lo, delay hi, ...
            if (label == 0xF9 && u8(p) >= 3) pendingDelay = u16(p + 2)
            skipSubBlocks()
          case 0x2C => // image descriptor
            val m = GifFrameMeta(u16(p + 1), u16(p + 3), u16(p + 5),
              u16(p + 7), pendingDelay)
            val idPacked = u8(p + 9)
            p += 10
            if ((idPacked & 0x80) != 0) p += 3 * (1 << ((idPacked & 7) + 1))
            p += 1 // LZW minimum code size
            skipSubBlocks()
            out += m
            pendingDelay = 0
          case other => throw new IllegalArgumentException(
            f"JdkCodec: unexpected GIF block 0x$other%02x at offset $p")
        }
      }
      out.result()
    }

    /** Animated-GIF frames with their start timestamps (from each
      * frame's GraphicControlExtension delay, stored in centiseconds)
      * and the total duration. ImageIO ships a real multi-frame GIF
      * reader in the bare JDK — this is the one container where frame
      * sampling needs no external codec. */
    private def readGifFrames(bytes: Array[Byte])
        : (IndexedSeq[(BufferedImage, Long)], Long) = {
      val metas = scanGifMeta(bytes)
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new ByteArrayInputStream(bytes))
      val reader = gifReaderSpi.createReaderInstance()
      try {
        reader.setInput(iis, false)
        var t = 0L
        val out = IndexedSeq.newBuilder[(BufferedImage, Long)]
        var i = 0
        while (i < metas.length) {
          val m = metas(i)
          // `reader.read(i)` returns the STORED frame, which for a
          // differencing-optimized GIF is only the changed
          // sub-rectangle — checksumming that would silently describe
          // a patch, not the displayed frame. Full-frame GIFs only;
          // partial frames are a typed failure, not a wrong answer.
          require(m.left == 0 && m.top == 0 && m.w == metas(0).w &&
            m.h == metas(0).h,
            s"JdkCodec: frame $i is a partial (differencing-optimized) " +
              "GIF frame; only full-frame GIFs are supported without a " +
              "compositing decoder")
          out += ((reader.read(i), t))
          t += m.delayCs * 10L
          i += 1
        }
        (out.result(), t)
      } finally { reader.dispose(); iis.close() }
    }

    /** Pixel checksum of one frame: sum of the low RGB byte per pixel
      * (R=G=B for the gray palettes these fixtures use) — integer
      * arithmetic an oracle replays exactly. */
    private def frameChecksum(img: BufferedImage): Long = {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += (img.getRGB(x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      sum
    }

    /** REAL frame sampling for animated GIF: decode every frame with
      * ImageIO, place it on the timeline by its stored delay, and emit
      * the frame covering each `everyMs` tick with its pixel checksum
      * as the frame hash. Still images and video are typed failures —
      * the JDK has no video decoder, and sampling a still is a caller
      * error, not an empty result. */
    override def sampleFrames(mediaType: String, bytes: Array[Byte],
        everyMs: Long, maxFrames: Int): Seq[(Int, Long, String)] =
      mediaType match {
        case "image" if sniff(bytes) == "gif" =>
          val (frames, totalMs) = readGifFrames(bytes)
          val n = math.min(maxFrames.toLong,
            totalMs / math.max(1L, everyMs)).toInt
          (0 until n).map { k =>
            val ts = k * everyMs
            val fi = frames.lastIndexWhere(_._2 <= ts)
            (k, ts, frameChecksum(frames(fi)._1).toString)
          }
        case "image" => throw new IllegalArgumentException(
          s"JdkCodec: frame sampling needs a multi-frame container " +
            s"(animated GIF); got a still ${sniff(bytes)}")
        case other => throw new IllegalArgumentException(
          s"JdkCodec: no JVM frame decoder for media_type=$other " +
            "(video needs an external MediaCodec)")
      }
  }

  /** Deterministic synthetic images for the real-codec driver queries:
    * gray(x, y, doc) = (31x + 17y + 13·doc) mod 256 — pure integer
    * arithmetic a SQL oracle replays exactly, while the Spark side
    * round-trips the pixels through a REAL PNG encode + [[JdkCodec]]
    * decode (PNG is lossless, so the samples must survive bit-exact). */
  object SyntheticImages {
    def grayAt(docId: Long, x: Int, y: Int): Int =
      ((x * 31L + y * 17L + docId * 13L) % 256L).toInt

    def encodePng(docId: Long, w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0, grayAt(docId, x, y))
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      // memory-cache stream: ImageIO.write(_, _, OutputStream) would
      // otherwise spool through a temp FILE per row (useCache default)
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try { javax.imageio.ImageIO.write(img, "png", ios); ios.flush() }
      finally ios.close()
      out.toByteArray
    }

    /** Sum of gray samples — the readback checksum of a decoded PNG. */
    def graySum(bytes: Array[Byte]): Long = {
      // memory-cache stream (not the InputStream overload): this runs
      // per ROW inside a UDF, and the default path spools a temp file
      val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      // ImageIO.read(ImageInputStream) closes the stream itself
      val img = javax.imageio.ImageIO.read(iis)
      require(img != null, "graySum: undecodable bytes")
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          sum += img.getRaster.getSample(x, y, 0)
          x += 1
        }
        y += 1
      }
      sum
    }

    /** 256-gray indexed palette: the GIF writer keeps an
      * IndexColorModel verbatim (256 grays = exactly one full GIF
      * palette), so samples survive the animated-GIF round-trip
      * bit-exact — the PNG-lossless argument, applied to GIF. */
    private lazy val grayPalette: java.awt.image.IndexColorModel = {
      val ramp = Array.tabulate(256)(_.toByte)
      new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    }

    private def grayIndexedFrame(seed: Long, w: Int,
        h: Int): java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, grayPalette)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.getRaster.setSample(x, y, 0, grayAt(seed, x, y))
          x += 1
        }
        y += 1
      }
      img
    }

    /** Deterministic animated GIF: frame f's pixels are
      * grayAt(docId + 1000·f, x, y), every frame delayed `delayMs`
      * (must be a multiple of 10 — GIF stores centiseconds). Written
      * with the JDK's own GIF writer via a per-frame
      * GraphicControlExtension, so [[JdkCodec.sampleFrames]] exercises
      * a REAL multi-frame container end to end. */
    def encodeGif(docId: Long, w: Int, h: Int, nFrames: Int,
        delayMs: Int): Array[Byte] = {
      require(delayMs % 10 == 0, s"GIF delay is centisecond-grained: $delayMs")
      val writers = javax.imageio.ImageIO.getImageWritersByFormatName("gif")
      require(writers.hasNext, "no GIF writer installed")
      val writer = writers.next()
      val out = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
      try {
        writer.setOutput(ios)
        writer.prepareWriteSequence(null)
        var f = 0
        while (f < nFrames) {
          val img = grayIndexedFrame(docId + 1000L * f, w, h)
          val meta = writer.getDefaultImageMetadata(
            new javax.imageio.ImageTypeSpecifier(img.getColorModel,
              img.getSampleModel), writer.getDefaultWriteParam)
          val fmt = meta.getNativeMetadataFormatName
          val root = meta.getAsTree(fmt)
            .asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
          val gce = {
            val existing = root.getElementsByTagName("GraphicControlExtension")
            if (existing.getLength > 0)
              existing.item(0).asInstanceOf[javax.imageio.metadata.IIOMetadataNode]
            else {
              val n = new javax.imageio.metadata.IIOMetadataNode(
                "GraphicControlExtension")
              root.appendChild(n)
              n
            }
          }
          gce.setAttribute("disposalMethod", "none")
          gce.setAttribute("userInputFlag", "FALSE")
          gce.setAttribute("transparentColorFlag", "FALSE")
          gce.setAttribute("transparentColorIndex", "0")
          gce.setAttribute("delayTime", (delayMs / 10).toString)
          meta.setFromTree(fmt, root)
          writer.writeToSequence(new javax.imageio.IIOImage(img, null, meta),
            null)
          f += 1
        }
        writer.endWriteSequence()
        ios.flush()
      } finally { writer.dispose(); ios.close() }
      out.toByteArray
    }

    /** Stage one synthetic animated GIF per input row, ready for
      * [[Multimodal.sampleFrames]] with [[JdkCodec]]. */
    def stageGif(ids: DataFrame, idCol: String, w: Long => Int,
        h: Long => Int, nFrames: Long => Int, delayMs: Int): DataFrame = {
      val ds = ids.select(col(idCol).cast("long").as("id"))
        .as(Encoders.scalaLong)
      ds.map { id =>
        MediaRow(id.toString, "image",
          encodeGif(id, w(id), h(id), nFrames(id), delayMs))
      }(Encoders.product[MediaRow]).toDF()
    }

    /** Stage one synthetic PNG per input row: (doc_id, media_type,
      * content) with doc-dependent dimensions, ready for [[decode]] /
      * [[resize]] / [[extractFeatures]] with [[JdkCodec]]. */
    def stage(ids: DataFrame, idCol: String, w: Long => Int,
              h: Long => Int): DataFrame = {
      val ds = ids.select(col(idCol).cast("long").as("id"))
        .as(Encoders.scalaLong)
      ds.map { id =>
        MediaRow(id.toString, "image", encodePng(id, w(id), h(id)))
      }(Encoders.product[MediaRow]).toDF()
    }
  }

  /** Decode: binary → typed metadata columns. Batched per partition
    * (the JVM analog of a mapInPandas batch: one codec instance per
    * partition, rows streamed through it). */
  def decode(media: DataFrame, codec: MediaCodec = FakeCodec): DataFrame = {
    val ds = media.select(col("doc_id").cast("string").as("doc_id"),
        col("media_type"), col("content"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.map { r =>
        val m = codec.decode(r.media_type, r.content)
        DecodedRow(r.doc_id, r.media_type, r.content, m.width, m.height,
          m.channels, m.sampleRateHz, m.durationMs, m.codec)
      }
    }(Encoders.product[DecodedRow]).toDF()
  }

  /** Resize images to (w × h): metadata recomputed, content replaced by
    * the codec's output (the fake returns a content digest). */
  def resize(decoded: DataFrame, w: Int, h: Int,
             codec: MediaCodec = FakeCodec): DataFrame = {
    val ds = decoded.select(col("doc_id"), col("media_type"), col("content"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.map { r =>
        val (m2, bytes) = codec.resize(r.media_type, r.content, w, h)
        DecodedRow(r.doc_id, r.media_type, bytes, m2.width, m2.height,
          m2.channels, m2.sampleRateHz, m2.durationMs, m2.codec)
      }
    }(Encoders.product[DecodedRow]).toDF()
  }

  /** Frame sampling: one row per sampled frame at `everyMs` intervals,
    * capped at `maxFrames` (a bounded flatMap — the only
    * row-multiplying operator here). Timing, frame selection, and the
    * frame hash are the CODEC's contract: [[FakeCodec]] (and any codec
    * without a frame decoder) derives ticks from decode metadata and
    * hashes the container bytes; [[JdkCodec]] really decodes animated
    * GIFs frame by frame. */
  def sampleFrames(decoded: DataFrame, everyMs: Long, maxFrames: Int,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    val ds = decoded.select(col("doc_id"), col("media_type"), col("content"))
      .as(Encoders.product[MediaRow])
    ds.flatMap { r =>
      codec.sampleFrames(r.media_type, r.content, everyMs, maxFrames)
        .map { case (i, ts, fh) => FrameRow(r.doc_id, i, ts, fh) }
    }(Encoders.product[FrameRow]).toDF()
  }

  /** Feature extraction: binary → Array[Float] embedding column.
    * Normalization is the CODEC's contract: [[FakeCodec]] returns unit
    * vectors (mock embedding); [[JdkCodec]] returns raw pooled
    * luminance / RMS values — L2-normalize downstream before feeding a
    * cosine-threshold ANN/dedup operator. */
  def extractFeatures(media: DataFrame, dim: Int = 64,
                      codec: MediaCodec = FakeCodec): DataFrame = {
    val ds = media.select(col("doc_id").cast("string").as("doc_id"),
        col("media_type"), col("content"))
      .as(Encoders.product[MediaRow])
    ds.mapPartitions { rows =>
      rows.map(r => FeatureRow(r.doc_id, r.media_type,
        codec.extractFeature(r.media_type, r.content, dim)))
    }(Encoders.product[FeatureRow]).toDF()
  }
}
