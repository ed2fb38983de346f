package graft

import org.apache.spark.sql.functions._

import graft.multimodal.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("feature extraction is deterministic and schema-stable") {
    val media = Seq(
      Multimodal.MediaRow(1L, "payload-one".getBytes, "image"),
      Multimodal.MediaRow(2L, "payload-two".getBytes, "audio"),
      Multimodal.MediaRow(3L, Array.emptyByteArray, "video")).toDS()
    val f1 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    val f2 = Multimodal.extractFeatures(media, dim = 8).collect().sortBy(_.id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(_.features.length == 8))
    assert(f1.find(_.id == 1).get.n_bytes == 11L)
    assert(f1.find(_.id == 3).get.n_bytes == 0L)
    // distinct payloads → distinct feature vectors
    assert(f1.find(_.id == 1).get.features.toSeq !=
      f2.find(_.id == 2).get.features.toSeq)
  }

  test("frame sampling emits one row per interval from duration metadata") {
    val media = Seq((1L, 2500L), (2L, 900L), (3L, 0L)).toDF("id", "duration_ms")
    val frames = Multimodal.sampleFrames(media, "duration_ms", everyMs = 1000L)
      .groupBy("id").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames(1L) == 3L) // 0,1000,2000
    assert(frames(2L) == 1L)
    // degenerate duration = NO frames — the extractFrameFeatures
    // contract; a phantom frame 0 here would silently change per-clip
    // counts the moment the stub explode becomes real decoding
    assert(!frames.contains(3L))
    intercept[IllegalArgumentException] {
      Multimodal.sampleFrames(media, "duration_ms", everyMs = 0L)
    }
  }

  test("frame feature extraction: per-frame determinism, counts, zero-duration") {
    import graft.multimodal.Multimodal
    import Multimodal.VideoRow
    val vids = Seq(
      VideoRow(1L, "clip one".getBytes, 2100L),  // frames 0,1,2 at 1000ms
      VideoRow(2L, "clip two".getBytes, 1000L),  // frame 0
      VideoRow(3L, "empty".getBytes, 0L),        // zero duration: NO frames
      VideoRow(4L, "clip one".getBytes, 2100L))  // same payload as 1
      .toDS()
    val got = Multimodal.extractFrameFeatures(vids, everyMs = 1000, dim = 4)
      .collect()
      .groupBy(_.id)
    assert(got(1L).map(_.frame_idx).sorted.toSeq == Seq(0L, 1L, 2L))
    assert(got(2L).map(_.frame_idx).toSeq == Seq(0L))
    assert(!got.contains(3L))
    // determinism: same (payload, frame) → same features across rows/JVMs
    val f1 = got(1L).sortBy(_.frame_idx).map(_.features.toSeq)
    val f4 = got(4L).sortBy(_.frame_idx).map(_.features.toSeq)
    assert(f1.toSeq == f4.toSeq)
    // distinct frames of one clip decode differently
    assert(f1(0) != f1(1))
    assert(got(1L).forall(_.features.length == 4))
    intercept[IllegalArgumentException](
      Multimodal.extractFrameFeatures(vids, everyMs = 0).collect())
  }

  // ----------------------------------------------------------------
  // Real codecs (Codecs.scala): genuine PNG / PCM WAV bytes
  // ----------------------------------------------------------------
  import graft.multimodal.Codecs

  test("PNG: encode→decode round trip is bit-exact, RGB decodes to band mean") {
    val img = Codecs.Png.encodeGray(5, 3, (x, y) => x * 40 + y * 11)
    // genuine PNG magic
    assert((img(0) & 0xff) == 0x89 && img(1) == 'P' && img(2) == 'N' && img(3) == 'G')
    val dec = Codecs.Png.decodeGray(img)
    assert(dec.width == 5 && dec.height == 3)
    for (y <- 0 until 3; x <- 0 until 5)
      assert(dec.gray(y * 5 + x) == ((x * 40 + y * 11) & 0xff))

    // an RGB PNG (not produced by our encoder) decodes via band mean
    val rgb = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)   // mean 20
    rgb.setRGB(1, 0, (90 << 16) | (90 << 8) | 90)   // mean 90
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", out)
    val decRgb = Codecs.Png.decodeGray(out.toByteArray)
    assert(decRgb.gray.toSeq == Seq(20, 90))

    intercept[IllegalArgumentException](Codecs.Png.decodeGray(Array[Byte](1, 2, 3)))
    intercept[IllegalArgumentException](Codecs.Png.decodeGray(Array.emptyByteArray))
  }

  test("PNG: 16-bit gray normalizes to 0..255; indexed palettes decode " +
    "intensities, not indices") {
    // a legal 16-bit gray PNG: raw raster samples run to 65535 and would
    // overflow every 0..255 consumer (the histogram indexer crashed)
    val img16 = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    img16.getRaster.setSample(0, 0, 0, 65535)
    img16.getRaster.setSample(1, 0, 0, 0)
    val out16 = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img16, "png", out16))
    val dec16 = Codecs.Png.decodeGray(out16.toByteArray)
    assert(dec16.gray.toSeq == Seq(255, 0), s"got ${dec16.gray.toSeq}")
    val feats = new Codecs.PngFeatureDecoder()
      .decodeFeatures(out16.toByteArray, 8)
    assert(feats.sum > 0f) // used to throw AIOOBE

    // indexed: palette {0 -> white, 1 -> black}; raw samples are the
    // INDICES 0/1 — decode must resolve intensities 255/0
    val pal = new java.awt.image.IndexColorModel(1, 2,
      Array(255.toByte, 0.toByte), Array(255.toByte, 0.toByte),
      Array(255.toByte, 0.toByte))
    val imgIdx = new java.awt.image.BufferedImage(2, 1,
      java.awt.image.BufferedImage.TYPE_BYTE_BINARY, pal)
    imgIdx.getRaster.setSample(0, 0, 0, 0) // white
    imgIdx.getRaster.setSample(1, 0, 0, 1) // black
    val outIdx = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(imgIdx, "png", outIdx))
    val decIdx = Codecs.Png.decodeGray(outIdx.toByteArray)
    assert(decIdx.gray.toSeq == Seq(255, 0), s"got ${decIdx.gray.toSeq}")

    // gray+alpha: 2 raster bands but ONE color component — averaging the
    // opaque alpha in would read gray g as (g + 255) / 2
    val cs = java.awt.color.ColorSpace.getInstance(
      java.awt.color.ColorSpace.CS_GRAY)
    val cmGA = new java.awt.image.ComponentColorModel(cs, true, false,
      java.awt.Transparency.TRANSLUCENT, java.awt.image.DataBuffer.TYPE_BYTE)
    val rasterGA = cmGA.createCompatibleWritableRaster(2, 1)
    val imgGA = new java.awt.image.BufferedImage(cmGA, rasterGA, false, null)
    rasterGA.setSample(0, 0, 0, 100); rasterGA.setSample(0, 0, 1, 255)
    rasterGA.setSample(1, 0, 0, 200); rasterGA.setSample(1, 0, 1, 255)
    val outGA = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(imgGA, "png", outGA))
    val decGA = Codecs.Png.decodeGray(outGA.toByteArray)
    assert(decGA.gray.toSeq == Seq(100, 200), s"got ${decGA.gray.toSeq}")
  }

  test("WAV frame decoder: negative frame index is the zero vector, like " +
    "past-the-clip") {
    val wav = Codecs.Wav.encodePcm16Mono(
      Array.tabulate[Short](800)(i => (i * 7 % 1000).toShort), 8000)
    val d = new Codecs.WavFrameDecoder(windowMs = 50)
    assert(d.decodeFrame(wav, -1L, 4).toSeq == Seq(0f, 0f, 0f, 0f))
    assert(d.decodeFrame(wav, 1000L, 4).toSeq == Seq(0f, 0f, 0f, 0f))
    assert(d.decodeFrame(wav, 0L, 4).exists(_ > 0f))
  }

  test("WAV: round trip, hand-built file with unknown odd-size chunk, errors") {
    val samples = Array.tabulate(100)(i => ((i * 773) % 65536 - 32768).toShort)
    val wav = Codecs.Wav.encodePcm16Mono(samples, 16000)
    val dec = Codecs.Wav.decodePcm16Mono(wav)
    assert(dec.sampleRate == 16000)
    assert(dec.samples.toSeq == samples.toSeq)

    // hand-built file, byte by byte: RIFF/WAVE, an UNKNOWN odd-size chunk
    // ("junk", 3 bytes + pad) between fmt and data — the walker must skip
    // it with word alignment and still find the data chunk
    val bb = java.nio.ByteBuffer.allocate(12 + 24 + 12 + 12)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(52).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16)
      .putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
    bb.put("junk".getBytes).putInt(3).put(Array[Byte](7, 7, 7, 0)) // odd + pad
    bb.put("data".getBytes).putInt(4).putShort(1234).putShort(-4321)
    val hand = Codecs.Wav.decodePcm16Mono(bb.array())
    assert(hand.sampleRate == 8000)
    assert(hand.samples.toSeq == Seq[Short](1234, -4321))

    // stereo rejected; truncated data chunk rejected; garbage rejected
    val stereo = Codecs.Wav.encodePcm16Mono(samples, 8000).clone()
    stereo(22) = 2 // channel count lives at offset 22
    intercept[IllegalArgumentException](Codecs.Wav.decodePcm16Mono(stereo))
    intercept[IllegalArgumentException](
      Codecs.Wav.decodePcm16Mono(wav.take(wav.length - 10)))
    intercept[IllegalArgumentException](
      Codecs.Wav.decodePcm16Mono("not a wav at all".getBytes))
  }

  test("real decoders drive the extract operators over genuine bytes") {
    // PNG histogram features through extractFeatures
    val png = Codecs.Png.encodeGray(4, 4, (x, y) => if (x < 2) 0 else 255)
    val media = Seq(Multimodal.MediaRow(1L, png, "image")).toDS()
    val feats = Multimodal.extractFeatures(media, dim = 4,
      decoder = new Codecs.PngFeatureDecoder).collect().head
    // half the pixels in the lowest bin, half in the highest; sums to 1
    assert(feats.features.toSeq == Seq(0.5f, 0f, 0f, 0.5f))

    // WAV energy features: silent first half, loud second half
    val loud = Array.tabulate(800)(i =>
      if (i < 400) 0.toShort else 16384.toShort)
    val wav = Codecs.Wav.encodePcm16Mono(loud, 8000)
    val audio = Seq(Multimodal.MediaRow(2L, wav, "audio")).toDS()
    val af = Multimodal.extractFeatures(audio, dim = 2,
      decoder = new Codecs.WavFeatureDecoder).collect().head
    assert(af.features(0) == 0f)
    assert(math.abs(af.features(1) - 0.5f) < 1e-3)

    // frame decoder: 100ms windows at 8000Hz = 800 samples → the 1000-
    // sample clip yields full frame 0 and a 200-sample frame 1
    val clip = Array.tabulate(1000)(_ => 16384.toShort)
    val vids = Seq(Multimodal.VideoRow(3L,
      Codecs.Wav.encodePcm16Mono(clip, 8000), 125L)).toDS()
    val frames = Multimodal.extractFrameFeatures(vids, everyMs = 100, dim = 1,
      decoder = new Codecs.WavFrameDecoder(100L)).collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq == Seq(0L, 1L))
    assert(frames.forall(f => math.abs(f.features(0) - 0.5f) < 1e-3))
  }

  test("exact stats surfaces match closed forms (the q86–q88 fixtures)") {
    val id = 7L
    val w = (8 + id % 5).toInt
    val png = Codecs.Png.encodeGray(w, 8,
      (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
    val media = Seq(Multimodal.MediaRow(id, png, "image")).toDS()
    val st = Codecs.imageStats(media).collect().head
    val expected = (for (x <- 0 until w; y <- 0 until 8)
      yield (id * 31 + x * 7 + y * 13) % 256).sum
    assert(st.width == w && st.height == 8 && st.gray_sum == expected)

    val n = (2000 + id % 1000).toInt
    val samples = Array.tabulate(n)(i =>
      (((id * 7919L + i * 104729L) % 65536L) - 32768L).toShort)
    val wav = Seq(Multimodal.MediaRow(id,
      Codecs.Wav.encodePcm16Mono(samples, 8000), "audio")).toDS()
    val au = Codecs.audioStats(wav).collect().head
    assert(au.sample_rate == 8000L && au.n_samples == n)
    assert(au.sum_samples == samples.map(_.toLong).sum)

    val fr = Codecs.audioFrameStats(wav, windowMs = 100).collect()
      .sortBy(_.frame_idx)
    assert(fr.length == (n + 799) / 800)
    assert(fr.map(_.n_samples).sum == n)
    assert(fr.map(_.sum_samples).sum == samples.map(_.toLong).sum)
    assert(fr.last.n_samples == n - (fr.length - 1) * 800)
  }

  test("JPEG: lossy round trip — exact dimensions, bounded error, and " +
    "the error gate has teeth") {
    import spark.implicits._
    def gen(id: Long)(x: Int, y: Int): Int = (40 + 2 * x + 3 * y + (id % 50)).toInt
    val media = (0L until 20L).map { id =>
      val w = (8 + id % 5).toInt
      Multimodal.MediaRow(id, Codecs.Jpeg.encodeGray(w, 8, gen(id)), "image")
    }.toDS()
    // dimensions survive lossy coding exactly; the smooth gradient
    // reconstructs within a single gray level at q=0.95 (the q99 gate
    // allows 6)
    val st = Codecs.imageErrStats(media,
      (id, x, y) => gen(id)(x, y)).collect().sortBy(_.id)
    assert(st.length == 20)
    st.foreach { s =>
      assert(s.width == 8 + s.id % 5 && s.height == 8)
      assert(s.max_abs_err <= 6, s"id=${s.id} err=${s.max_abs_err}")
    }
    // TEETH: a decode that transposed the raster (x/y swapped) must
    // blow past the gate on every non-square image — the tolerance is
    // a JPEG-noise allowance, not a blank check
    val transposed = Codecs.imageErrStats(media,
      (id, x, y) => (40 + 3 * x + 2 * y + (id % 50)).toInt).collect()
    assert(transposed.filter(s => s.width != s.height)
      .forall(_.max_abs_err > 6))
    // quality knob is validated; JPEG bytes really are JPEG (SOI marker)
    intercept[IllegalArgumentException] {
      Codecs.Jpeg.encodeGray(4, 4, (_, _) => 0, quality = 0f)
    }
    val bytes = Codecs.Jpeg.encodeGray(9, 8, gen(3L))
    assert((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
    // corrupt payloads fail loudly through the shared ImageIO decode
    intercept[IllegalArgumentException] {
      Codecs.Png.decodeGray("not an image".getBytes)
    }
    // lower quality still preserves dimensions (the exact surface)
    val lq = Codecs.Png.decodeGray(
      Codecs.Jpeg.encodeGray(11, 8, gen(7L), quality = 0.3f))
    assert(lq.width == 11 && lq.height == 8)
  }
}
