package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.US_ASCII

import javax.imageio.ImageIO

import org.apache.spark.sql.Dataset

/** REAL public-format media codecs behind the [[Multimodal]] decoder
  * contracts — the genuine-bytes counterpart of the deterministic
  * [[Multimodal.FakeDecoder]] stand-ins (reference has no multimodal
  * analogue; this is the added-scope north star's decode step made real
  * for the two formats a JVM can decode with zero external libraries):
  *
  *   - PNG (any `javax.imageio`-readable image): pure-Java decoder
  *     bundled with every JDK, headless-safe.
  *   - PCM WAV (RIFF/WAVE, 16-bit mono): ~40 lines of chunk walking —
  *     the format is public and simple enough to parse exactly.
  *
  * Everything runs in the same executor-batch shape as the fakes: one
  * decoder instance per partition, one decode per row (or per frame),
  * feature vectors feeding the kNN/dedup layers unchanged. The
  * `*Stats` operators expose the EXACT integer surface of each decode
  * (dimensions, sample counts, pixel/sample sums) so a round trip over
  * real encoded bytes is DuckDB-oracle-checkable end to end, while the
  * float feature profiles (histograms, energy) are spec-gated.
  */
object Codecs {

  // ------------------------------------------------------------------
  // PNG
  // ------------------------------------------------------------------

  /** Decoded 8-bit grayscale view of an image: band 0 for single-band
    * images, integer mean of the first three bands otherwise. Samples
    * are row-major (y outer, x inner).
    */
  final case class GrayImage(width: Int, height: Int, gray: Array[Int])

  object Png {

    /** Encode an 8-bit grayscale image to genuine PNG bytes via the
      * JDK's ImageIO writer. `pixel(x, y)` is masked to 0..255. PNG is
      * lossless, so [[decodeGray]] of the result is bit-exact.
      */
    def encodeGray(width: Int, height: Int, pixel: (Int, Int) => Int): Array[Byte] = {
      require(width > 0 && height > 0,
        s"Png.encodeGray: degenerate dimensions ${width}x$height")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, pixel(x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      require(ImageIO.write(img, "png", out),
        "Png.encodeGray: no PNG writer registered in this JVM")
      out.toByteArray
    }

    /** Decode any ImageIO-supported payload (PNG is the tested
      * contract) to grayscale samples. Fails loudly on undecodable
      * bytes — a corrupt payload in a media pipeline is an error, not
      * an empty row.
      */
    def decodeGray(payload: Array[Byte]): GrayImage = {
      require(payload != null && payload.nonEmpty,
        "Png.decodeGray: empty payload")
      ImageIO.setUseCache(false) // no temp-file cache inside executors
      val img = ImageIO.read(new ByteArrayInputStream(payload))
      require(img != null, "Png.decodeGray: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      val gray = new Array[Int](w * h)
      img.getColorModel match {
        case _: java.awt.image.IndexColorModel =>
          // palette-indexed: raster samples are palette INDICES, not
          // intensities — a B/W indexed image read raw would emit 0/1
          // and every consumer (gray_sum, histograms) would be silently
          // wrong. Resolve through the color model instead.
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              gray(y * w + x) =
                (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
              x += 1
            }
            y += 1
          }
        case cm =>
          val raster = img.getRaster
          // COLOR components only: a gray+alpha PNG has 2 bands but 1
          // color component — averaging the alpha band in would skew an
          // opaque gray-g image to (g + 255) / 2
          val colorBands = math.max(1,
            math.min(cm.getNumColorComponents, raster.getNumBands))
          val sizes = cm.getComponentSize
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              var s = 0
              var b = 0
              while (b < colorBands) {
                val bits = if (b < sizes.length) sizes(b) else 8
                val maxV = (1 << bits) - 1
                val sample = raster.getSample(x, y, b)
                // normalize each band to 0..255: a legal 16-bit gray PNG
                // carries samples up to 65535, which would overflow every
                // 0..255 consumer (the histogram indexer crashes; sums
                // silently skew). 8-bit passes through bit-exact.
                s += (if (maxV == 255) sample
                      else ((sample.toLong * 255 + maxV / 2) / maxV).toInt)
                b += 1
              }
              gray(y * w + x) = s / colorBands
              x += 1
            }
            y += 1
          }
      }
      GrayImage(w, h, gray)
    }
  }

  // ------------------------------------------------------------------
  // JPEG
  // ------------------------------------------------------------------

  object Jpeg {

    /** Encode an 8-bit grayscale image to genuine baseline JPEG bytes
      * via the JDK's ImageIO writer at `quality` (0..1]. JPEG is LOSSY:
      * `decodeGray(encodeGray(img))` approximates img — dimensions are
      * exact, pixel values within a few gray levels for smooth content
      * at high quality (grayscale input is a single-component scan, so
      * chroma subsampling never enters). Decode side is
      * [[Png.decodeGray]] — ImageIO sniffs the container, the same
      * entry point serves both formats.
      */
    def encodeGray(width: Int, height: Int, pixel: (Int, Int) => Int,
        quality: Float = 0.95f): Array[Byte] = {
      require(width > 0 && height > 0,
        s"Jpeg.encodeGray: degenerate dimensions ${width}x$height")
      require(quality > 0f && quality <= 1f,
        s"Jpeg.encodeGray: quality $quality outside (0, 1]")
      val img = new BufferedImage(width, height, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < height) {
        var x = 0
        while (x < width) {
          raster.setSample(x, y, 0, pixel(x, y) & 0xff)
          x += 1
        }
        y += 1
      }
      val writers = ImageIO.getImageWritersByFormatName("jpeg")
      require(writers.hasNext,
        "Jpeg.encodeGray: no JPEG writer registered in this JVM")
      val writer = writers.next()
      ImageIO.setUseCache(false) // no temp-file cache inside executors
      val out = new ByteArrayOutputStream()
      val ios = ImageIO.createImageOutputStream(out)
      try {
        writer.setOutput(ios)
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(quality)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally {
        writer.dispose()
        ios.close()
      }
      out.toByteArray
    }
  }

  // ------------------------------------------------------------------
  // PCM WAV
  // ------------------------------------------------------------------

  final case class Audio(sampleRate: Int, samples: Array[Short])

  object Wav {

    /** Encode 16-bit mono PCM samples as a canonical RIFF/WAVE file
      * (44-byte header + little-endian data chunk).
      */
    def encodePcm16Mono(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      require(sampleRate > 0, s"Wav.encodePcm16Mono: sampleRate=$sampleRate")
      val dataLen = samples.length * 2
      val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataLen)
        .put("WAVE".getBytes(US_ASCII))
      buf.put("fmt ".getBytes(US_ASCII)).putInt(16)
      buf.putShort(1)                   // audio format: PCM
      buf.putShort(1)                   // channels: mono
      buf.putInt(sampleRate)
      buf.putInt(sampleRate * 2)        // byte rate
      buf.putShort(2)                   // block align
      buf.putShort(16)                  // bits per sample
      buf.put("data".getBytes(US_ASCII)).putInt(dataLen)
      var i = 0
      while (i < samples.length) { buf.putShort(samples(i)); i += 1 }
      buf.array()
    }

    /** Decode a RIFF/WAVE payload by walking its chunk list (unknown
      * chunks — LIST, fact, … — are skipped, with the RIFF odd-size pad
      * byte honored), requiring PCM / 16-bit / mono in the fmt chunk.
      * Exactly the published container layout; no codec library.
      */
    def decodePcm16Mono(payload: Array[Byte]): Audio = {
      require(payload != null && payload.length >= 12,
        "Wav.decodePcm16Mono: payload shorter than a RIFF header")
      val buf = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, US_ASCII)
      }
      require(fourcc() == "RIFF", "Wav.decodePcm16Mono: missing RIFF magic")
      buf.getInt // declared riff size — trust the actual buffer instead
      require(fourcc() == "WAVE", "Wav.decodePcm16Mono: not a WAVE form")
      var sampleRate = -1
      var data: Array[Short] = null
      while (buf.remaining() >= 8) {
        val id = fourcc()
        val size = buf.getInt
        require(size >= 0 && size <= buf.remaining(),
          s"Wav.decodePcm16Mono: chunk '$id' declares $size bytes, " +
            s"${buf.remaining()} remain (truncated file?)")
        val next = buf.position() + size + (size & 1) // word-aligned chunks
        id match {
          case "fmt " =>
            require(size >= 16, s"Wav.decodePcm16Mono: fmt chunk of $size bytes")
            val fmt = buf.getShort()
            val channels = buf.getShort()
            sampleRate = buf.getInt
            buf.getInt   // byte rate
            buf.getShort // block align
            val bits = buf.getShort()
            require(fmt == 1 && channels == 1 && bits == 16,
              s"Wav.decodePcm16Mono: need PCM/mono/16-bit, " +
                s"got format=$fmt channels=$channels bits=$bits")
          case "data" =>
            require(sampleRate > 0,
              "Wav.decodePcm16Mono: data chunk before fmt chunk")
            data = new Array[Short](size / 2)
            var i = 0
            while (i < data.length) { data(i) = buf.getShort(); i += 1 }
          case _ => // skip unknown chunk
        }
        buf.position(math.min(next, buf.limit()))
      }
      require(data != null, "Wav.decodePcm16Mono: no data chunk")
      Audio(sampleRate, data)
    }
  }

  // ------------------------------------------------------------------
  // Real decoders behind the Multimodal contracts
  // ------------------------------------------------------------------

  /** Real image features: decode genuine PNG bytes, emit a `dim`-bin
    * normalized grayscale histogram (bins partition 0..255 evenly) —
    * scale-free, so images of different sizes land in one vector space
    * for the kNN/dedup layers.
    */
  final class PngFeatureDecoder extends Multimodal.MediaDecoder {
    override def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      if (payload == null || payload.isEmpty) return v
      val img = Png.decodeGray(payload)
      val n = img.gray.length
      var i = 0
      while (i < n) { v(img.gray(i) * dim / 256) += 1f; i += 1 }
      var j = 0
      while (j < dim) { v(j) /= n; j += 1 }
      v
    }
  }

  /** Real audio features: decode PCM WAV bytes, emit a `dim`-bucket RMS
    * energy profile (samples normalized to [-1, 1), clip split into dim
    * equal spans) — a fixed-length loudness contour per clip.
    */
  final class WavFeatureDecoder extends Multimodal.MediaDecoder {
    override def decodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
      if (payload == null || payload.isEmpty) return new Array[Float](dim)
      val audio = Wav.decodePcm16Mono(payload)
      rmsProfile(audio.samples, 0, audio.samples.length, dim)
    }
  }

  /** The `dim`-bucket RMS energy profile of `samples[from, until)` —
    * the ONE bucketing/normalization rule (i·dim/span index, ÷32768,
    * √mean-square per bucket) shared by the whole-clip and per-frame
    * decoders, so the two can never drift.
    */
  private def rmsProfile(samples: Array[Short], from: Int, until: Int,
      dim: Int): Array[Float] = {
    val v = new Array[Float](dim)
    val n = until - from
    if (n <= 0) return v
    val acc = new Array[Double](dim)
    val cnt = new Array[Int](dim)
    var i = 0
    while (i < n) {
      val b = (i.toLong * dim / n).toInt
      val s = samples(from + i) / 32768.0
      acc(b) += s * s
      cnt(b) += 1
      i += 1
    }
    var j = 0
    while (j < dim) {
      if (cnt(j) > 0) v(j) = math.sqrt(acc(j) / cnt(j)).toFloat
      j += 1
    }
    v
  }

  /** Real per-frame audio features: frame `frameIdx` is the
    * `windowMs`-long span starting at `frameIdx · windowMs` into the
    * clip (window length in samples derives from the DECODED header's
    * sample rate); features are the window's `dim`-bucket energy
    * profile. The [[Multimodal.FrameDecoder]] contract's "seek the
    * container to the frame offset and decode" made real.
    */
  final class WavFrameDecoder(windowMs: Long) extends Multimodal.FrameDecoder {
    require(windowMs > 0, s"WavFrameDecoder: windowMs=$windowMs must be > 0")
    override def decodeFrame(payload: Array[Byte], frameIdx: Long,
        dim: Int): Array[Float] = {
      val v = new Array[Float](dim)
      // any out-of-range frame — negative OR past the clip — is the
      // same zero vector (a negative index used to read samples(-ws))
      if (payload == null || payload.isEmpty || frameIdx < 0) return v
      val audio = Wav.decodePcm16Mono(payload)
      val ws = (audio.sampleRate * windowMs / 1000L).toInt
      require(ws > 0, s"WavFrameDecoder: window of ${windowMs}ms is shorter " +
        s"than one sample at ${audio.sampleRate}Hz")
      val from = frameIdx * ws
      val until = math.min(audio.samples.length.toLong, from + ws)
      if (from >= until) return v
      rmsProfile(audio.samples, from.toInt, until.toInt, dim)
    }
  }

  // ------------------------------------------------------------------
  // Exact-integer stats surfaces (the oracle-checkable decode slice)
  // ------------------------------------------------------------------

  final case class ImageStats(id: Long, width: Long, height: Long, gray_sum: Long)
  final case class AudioStats(id: Long, sample_rate: Long, n_samples: Long,
      sum_samples: Long)
  final case class FrameStats(id: Long, frame_idx: Long, n_samples: Long,
      sum_samples: Long)

  /** Decode every payload as an image and emit its exact integer
    * surface (dimensions + grayscale pixel sum) — same executor-batch
    * shape as [[Multimodal.extractFeatures]], values DuckDB-checkable
    * against a closed-form fixture.
    */
  def imageStats(media: Dataset[Multimodal.MediaRow]): Dataset[ImageStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val img = Png.decodeGray(row.payload)
        var s = 0L
        var i = 0
        while (i < img.gray.length) { s += img.gray(i); i += 1 }
        ImageStats(row.id, img.width.toLong, img.height.toLong, s)
      }
    }
  }

  final case class ImageErrStats(id: Long, width: Long, height: Long,
      max_abs_err: Long)

  /** Decode every payload as an image and compare it pixel-by-pixel
    * against a caller-supplied reference generator — the oracle surface
    * for LOSSY codecs (JPEG), where the decoded pixel sum has no closed
    * form but dimensions are exact and the worst-case reconstruction
    * error of a smooth fixture at high quality is boundable (and a
    * decode bug — transposed raster, band mixup, palette confusion —
    * blows far past any such bound). `ref(id, x, y)` is the generator's
    * 0..255 gray value; output is (id, width, height, max_abs_err).
    */
  def imageErrStats(media: Dataset[Multimodal.MediaRow],
      ref: (Long, Int, Int) => Int): Dataset[ImageErrStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val img = Png.decodeGray(row.payload)
        var m = 0L
        var y = 0
        while (y < img.height) {
          var x = 0
          while (x < img.width) {
            val e = math.abs(
              img.gray(y * img.width + x) - (ref(row.id, x, y) & 0xff)).toLong
            if (e > m) m = e
            x += 1
          }
          y += 1
        }
        ImageErrStats(row.id, img.width.toLong, img.height.toLong, m)
      }
    }
  }

  /** Decode every payload as PCM WAV and emit its exact integer surface
    * (header sample rate, sample count, signed sample sum).
    */
  def audioStats(media: Dataset[Multimodal.MediaRow]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { row =>
        val audio = Wav.decodePcm16Mono(row.payload)
        var s = 0L
        var i = 0
        while (i < audio.samples.length) { s += audio.samples(i); i += 1 }
        AudioStats(row.id, audio.sampleRate.toLong,
          audio.samples.length.toLong, s)
      }
    }
  }

  /** Frame-sampled exact stats: one row per `windowMs` window of each
    * decoded clip (frame count derives from the DECODED sample count +
    * header rate — real metadata, not a fixture column), with the
    * window's sample count and signed sum. The frame fan-out happens
    * inside the executor batch, mirroring
    * [[Multimodal.extractFrameFeatures]].
    */
  def audioFrameStats(media: Dataset[Multimodal.MediaRow],
      windowMs: Long): Dataset[FrameStats] = {
    require(windowMs > 0, s"audioFrameStats: windowMs=$windowMs must be > 0")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { row =>
        val audio = Wav.decodePcm16Mono(row.payload)
        val ws = (audio.sampleRate * windowMs / 1000L).toInt
        require(ws > 0, s"audioFrameStats: window of ${windowMs}ms is " +
          s"shorter than one sample at ${audio.sampleRate}Hz")
        val n = audio.samples.length
        val nFrames = (n + ws - 1) / ws
        (0 until nFrames).iterator.map { f =>
          val from = f * ws
          val until = math.min(n, from + ws)
          var s = 0L
          var i = from
          while (i < until) { s += audio.samples(i); i += 1 }
          FrameStats(row.id, f.toLong, (until - from).toLong, s)
        }
      }
    }
  }
}
