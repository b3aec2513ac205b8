package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}

import graft.multimodal.Multimodal
import graft.multimodal.Multimodal.{JdkCodec, SyntheticImages}

/** Real JDK codec: genuine PNG/WAV round-trips, deterministic resize,
  * pixel-exact features, typed failure for formats the JVM lacks. */
class JdkCodecSpec extends SparkSpec {

  private def wavBytes(rateHz: Int, seconds: Int, freqHz: Double): Array[Byte] = {
    val n = rateHz * seconds
    val data = new Array[Byte](2 * n)
    var i = 0
    while (i < n) {
      val v = (math.sin(2 * math.Pi * freqHz * i / rateHz) * 16384).toInt.toShort
      data(2 * i) = (v & 0xff).toByte
      data(2 * i + 1) = ((v >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new AudioInputStream(new ByteArrayInputStream(data), fmt, n.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("image: PNG round-trip is pixel-exact and meta is real") {
    val png = SyntheticImages.encodePng(7L, 20, 12)
    val m = JdkCodec.decode("image", png)
    assert((m.width, m.height, m.channels, m.codec) === ((20, 12, 1, "png")))
    // lossless: every sample survives the encode+decode
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(png))
    for (y <- 0 until 12; x <- 0 until 20)
      assert(img.getRaster.getSample(x, y, 0) === SyntheticImages.grayAt(7L, x, y))
  }

  test("resize: nearest-neighbor arithmetic, bit-deterministic") {
    val png = SyntheticImages.encodePng(3L, 16, 16)
    val (m1, b1) = JdkCodec.resize("image", png, 4, 4)
    val (_, b2) = JdkCodec.resize("image", png, 4, 4)
    assert(m1.width === 4 && m1.height === 4)
    assert(b1.toSeq === b2.toSeq)
    val out = javax.imageio.ImageIO.read(new ByteArrayInputStream(b1))
    for (y <- 0 until 4; x <- 0 until 4)
      assert(out.getRaster.getSample(x, y, 0) ===
        SyntheticImages.grayAt(3L, x * 16 / 4, y * 16 / 4))
  }

  test("features: grid-pooled luminance matches direct pixel math") {
    val png = SyntheticImages.encodePng(11L, 32, 32)
    val f = JdkCodec.extractFeature("image", png, 16)
    assert(f.length === 16)
    for (c <- 0 until 16) {
      val (cx, cy) = (c % 4, c / 4)
      val vals = for (dy <- 0 until 8; dx <- 0 until 8)
        yield SyntheticImages.grayAt(11L, cx * 8 + dx, cy * 8 + dy)
      val expect = (vals.sum.toDouble / 64 / 256.0).toFloat
      assert(f(c) === expect)
    }
  }

  test("other JDK image formats decode with correct meta and sniff") {
    val src = SyntheticImages.encodePng(5L, 24, 18)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(src))
    for ((fmt, sniffed) <- Seq("jpg" -> "jpeg", "bmp" -> "bmp", "gif" -> "gif")) {
      val out = new ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, out), fmt)
      val m = JdkCodec.decode("image", out.toByteArray)
      assert((m.width, m.height, m.codec) === ((24, 18, sniffed)), fmt)
    }
    // 1x1 edge: decode + 16-cell features degrade gracefully
    val tiny = SyntheticImages.encodePng(9L, 1, 1)
    assert(JdkCodec.decode("image", tiny).width === 1)
    val f = JdkCodec.extractFeature("image", tiny, 16)
    assert(f.length === 16 &&
      f.forall(v => v >= 0f && v <= 1f))
  }

  test("format OUTSIDE the magic-byte sniff (TIFF) decodes via the " +
      "registry-walk fallback instead of failing") {
    // the JDK ships a TIFF plugin (since 9) that the 4-entry sniff
    // doesn't know — these bytes must still decode, just off the SPI
    // fast path; sniff keeps reporting "bin" (the codec field states
    // what the FAST PATH knew, decode succeeds regardless)
    val src = SyntheticImages.encodePng(5L, 24, 18)
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(src))
    val out = new ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "tiff", out))
    val m = JdkCodec.decode("image", out.toByteArray)
    assert((m.width, m.height, m.codec) === ((24, 18, "bin")))
    // genuinely undecodable bytes still fail with the typed message
    val ex = intercept[IllegalArgumentException](
      JdkCodec.decode("image", Array[Byte](9, 9, 9, 9)))
    assert(ex.getMessage.contains("no installed ImageIO reader"))
  }

  test("audio: WAV metadata and RMS features are real") {
    val wav = wavBytes(8000, 1, 440.0)
    val m = JdkCodec.decode("audio", wav)
    assert((m.channels, m.sampleRateHz, m.durationMs) === ((1, 8000, 1000L)))
    val f = JdkCodec.extractFeature("audio", wav, 8)
    assert(f.length === 8)
    // a full-scale/2 sine has RMS ~ 16384/sqrt(2)/32768 ~ 0.3536
    f.foreach(v => assert(math.abs(v - 0.3536f) < 0.01f))
  }

  test("video: typed failure, not a silent fake") {
    val e = intercept[IllegalArgumentException](
      JdkCodec.decode("video", Array[Byte](1, 2, 3)))
    assert(e.getMessage.contains("video"))
  }

  test("animated GIF: real multi-frame decode samples the right frame " +
      "with exact pixel checksums") {
    val docId = 5L
    val (w, h, nFrames, delayMs) = (9, 7, 4, 40)
    val gif = SyntheticImages.encodeGif(docId, w, h, nFrames, delayMs)
    // duration 160ms, sampling every 50ms -> ticks 0,50,100 (160/50=3)
    // covering frames floor(ts/40) = 0, 1, 2
    val got = JdkCodec.sampleFrames("image", gif, everyMs = 50L,
      maxFrames = 10)
    assert(got.map(t => (t._1, t._2)) === Seq((0, 0L), (1, 50L), (2, 100L)))
    def expectedSum(frame: Int): Long =
      (for (y <- 0 until h; x <- 0 until w)
        yield SyntheticImages.grayAt(docId + 1000L * frame, x, y).toLong).sum
    assert(got.map(_._3) ===
      Seq(expectedSum(0).toString, expectedSum(1).toString,
        expectedSum(2).toString))
    // maxFrames caps the tick count
    assert(JdkCodec.sampleFrames("image", gif, 50L, 2).length === 2)
    // a still PNG is a typed failure, not an empty result
    val png = SyntheticImages.encodePng(docId, 8, 8)
    val e = intercept[IllegalArgumentException](
      JdkCodec.sampleFrames("image", png, 50L, 10))
    assert(e.getMessage.contains("multi-frame"), e.getMessage)
    // video remains a typed failure
    val ev = intercept[IllegalArgumentException](
      JdkCodec.sampleFrames("video", Array[Byte](1, 2, 3), 50L, 10))
    assert(ev.getMessage.contains("video"), ev.getMessage)
  }

  test("operators run end-to-end with the real codec") {
    import spark.implicits._
    val ids = Seq(1L, 2L, 3L).toDF("doc_id")
    val staged = SyntheticImages.stage(ids, "doc_id", _ => 16, _ => 16)
    val dec = Multimodal.decode(staged, JdkCodec).collect()
    assert(dec.length === 3 && dec.forall(r =>
      r.getAs[Int]("width") == 16 && r.getAs[String]("codec") == "png"))
    val feats = Multimodal.extractFeatures(staged, dim = 16, JdkCodec).collect()
    assert(feats.forall(_.getAs[Seq[Float]]("feature").length == 16))
  }
}
