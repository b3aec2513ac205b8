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
    def resize(meta: MediaMeta, w: Int, h: Int,
               bytes: Array[Byte]): (MediaMeta, Array[Byte])
    def extractFeature(mediaType: String, bytes: Array[Byte],
                       dim: Int): Array[Float]
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

    override def resize(meta: MediaMeta, w: Int, hgt: Int,
                        bytes: Array[Byte]): (MediaMeta, Array[Byte]) =
      (meta.copy(width = w, height = hgt),
        h(bytes ++ s"resize:${w}x$hgt".getBytes("UTF-8")))

    override def extractFeature(mediaType: String, bytes: Array[Byte],
                                dim: Int): Array[Float] = {
      val hex = h(bytes).map("%02x".format(_)).mkString
      TextFunctions.mockEmbedding(s"$mediaType:$hex", dim)
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
        val meta = codec.decode(r.media_type, r.content)
        val (m2, bytes) = codec.resize(meta, w, h, r.content)
        DecodedRow(r.doc_id, r.media_type, bytes, m2.width, m2.height,
          m2.channels, m2.sampleRateHz, m2.durationMs, m2.codec)
      }
    }(Encoders.product[DecodedRow]).toDF()
  }

  /** Frame sampling for video: one row per sampled frame at
    * `everyMs` intervals, capped at `maxFrames` (a bounded flatMap —
    * the only row-multiplying operator here). */
  def sampleFrames(decoded: DataFrame, everyMs: Long, maxFrames: Int,
                   codec: MediaCodec = FakeCodec): DataFrame = {
    val ds = decoded.select(col("doc_id"), col("media_type"), col("content"))
      .as(Encoders.product[MediaRow])
    ds.flatMap { r =>
      val meta = codec.decode(r.media_type, r.content)
      val n = math.min(maxFrames,
        math.max(0L, meta.durationMs / math.max(1L, everyMs)).toInt)
      (0 until n).map { i =>
        val ts = i * everyMs
        val fh = MessageDigest.getInstance("SHA-256")
          .digest(r.content ++ s"frame:$ts".getBytes("UTF-8"))
          .take(8).map("%02x".format(_)).mkString
        FrameRow(r.doc_id, i, ts, fh)
      }
    }(Encoders.product[FrameRow]).toDF()
  }

  /** Feature extraction: binary → Array[Float] embedding column,
    * unit-normalized, ready for the ANN/dedup operators. */
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
