package graft.multimodal

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (added scope, SURVEY.md north star): treat
  * image/audio/video payloads as opaque `binary` columns with a typed
  * metadata struct, and run decode / feature-extract / frame-sample as
  * per-partition batch operators.
  *
  * The decode step itself is STUBBED — media codecs are not in this
  * environment — behind [[MediaDecoder]], with a deterministic fake
  * implementation. Everything Spark-side is real and tested: the schema
  * contract, the partition-balanced batch shape (one decoder instance per
  * partition, amortized over its rows — the JVM analog of a vectorized
  * Pandas-UDF batch), and the feature-vector output layout that feeds the
  * kNN layer unchanged.
  */
object Multimodal {

  /** Typed metadata carried beside every payload. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType), // image | audio | video
    StructField("format", StringType),     // jpeg | wav | mp4 | ...
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  final case class MediaRow(id: Long, payload: Array[Byte], media_type: String)
  final case class MediaFeatures(id: Long, n_bytes: Long, checksum: Long,
      features: Array[Float])

  /** Decoder contract — one instance per partition, called per row.
    * A production implementation wraps a codec library; [[FakeDecoder]] is
    * the deterministic stand-in (real decode is `???` territory offline).
    */
  trait MediaDecoder extends Serializable {
    def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float]
  }

  /** Deterministic fake: hash-seeded pseudo-features. Same payload → same
    * vector on every JVM, so the downstream pipeline is fully testable.
    */
  object FakeDecoder extends MediaDecoder {
    override def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      if (payload != null && payload.nonEmpty) {
        val h0 = MurmurHash3.bytesHash(payload, 42)
        var i = 0
        while (i < dim) {
          // xorshift over the payload hash — cheap, stable, spread out
          var x = h0 ^ (i * 0x9e3779b9)
          x ^= x << 13; x ^= x >>> 17; x ^= x << 5
          v(i) = (x.toDouble / Int.MaxValue).toFloat
          i += 1
        }
      }
      v
    }
  }

  /** Feature extraction over a binary column: partition-balanced, one
    * decoder per partition, output ready for the kNN/dedup layers.
    */
  def extractFeatures(
      media: Dataset[MediaRow],
      dim: Int = 64,
      decoder: MediaDecoder = FakeDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val d = decoder // one instance per partition (batch shape)
      it.map { row =>
        val payload = row.payload
        val checksum =
          if (payload == null) 0L else MurmurHash3.bytesHash(payload, 7).toLong
        MediaFeatures(row.id,
          if (payload == null) 0L else payload.length.toLong,
          checksum, d.decodeFeatures(payload, dim))
      }
    }
  }

  /** Frame sampling contract for video payloads: every `everyMs` the
    * decoder would emit one frame row — the stub emits deterministic frame
    * indices from the metadata duration, exercising the explode shape.
    * Zero/negative/NULL duration emits NO frames — the same contract as
    * [[extractFrameFeatures]] (a phantom frame 0 here would silently
    * change per-clip frame counts the moment the stub explode is swapped
    * for real frame extraction).
    */
  def sampleFrames(media: DataFrame, durationMsCol: String, everyMs: Long): DataFrame = {
    require(everyMs > 0, s"sampleFrames: everyMs must be positive, got $everyMs")
    media.withColumn("frame_idx",
      explode(when(col(durationMsCol) > 0,
        sequence(lit(0L), floor((col(durationMsCol) - 1) / everyMs).cast("long")))
        .otherwise(array().cast("array<bigint>"))))
  }

  final case class VideoRow(id: Long, payload: Array[Byte], duration_ms: Long)
  final case class FrameFeatures(id: Long, frame_idx: Long, features: Array[Float])

  /** Per-frame decoder contract — one instance per partition, one call
    * per sampled frame. A production implementation seeks the container
    * to `frameIdx · everyMs` and decodes; [[FakeFrameDecoder]] is the
    * deterministic stand-in.
    */
  trait FrameDecoder extends Serializable {
    def decodeFrame(payload: Array[Byte], frameIdx: Long, dim: Int): Array[Float]
  }

  /** Deterministic fake frame decode: payload hash mixed with the frame
    * index — same (payload, frame) → same vector on every JVM.
    */
  object FakeFrameDecoder extends FrameDecoder {
    override def decodeFrame(payload: Array[Byte], frameIdx: Long,
        dim: Int): Array[Float] = {
      val base =
        if (payload == null || payload.isEmpty) 0
        else MurmurHash3.bytesHash(payload, 42)
      FakeDecoder.decodeFeatures(
        Array[Byte](
          (base >> 24).toByte, (base >> 16).toByte, (base >> 8).toByte, base.toByte,
          (frameIdx >> 24).toByte, (frameIdx >> 16).toByte,
          (frameIdx >> 8).toByte, frameIdx.toByte), dim)
    }
  }

  /** Frame-sampled feature extraction over video payloads: one frame
    * every `everyMs` across the clip (a clip of duration ≤ 0 emits no
    * frames), decoded per partition — the frame fan-out happens inside
    * the executor batch, so a long video never materializes as a single
    * wide row. Output feeds the kNN/dedup layers at frame grain.
    */
  def extractFrameFeatures(
      videos: Dataset[VideoRow],
      everyMs: Long,
      dim: Int = 64,
      decoder: FrameDecoder = FakeFrameDecoder): Dataset[FrameFeatures] = {
    require(everyMs > 0, s"extractFrameFeatures: everyMs=$everyMs must be > 0")
    import videos.sparkSession.implicits._
    videos.mapPartitions { it =>
      val d = decoder // one instance per partition (batch shape)
      it.flatMap { v =>
        val n = if (v.duration_ms <= 0) 0L else (v.duration_ms - 1) / everyMs + 1
        (0L until n).iterator.map(fi =>
          FrameFeatures(v.id, fi, d.decodeFrame(v.payload, fi, dim)))
      }
    }
  }
}
