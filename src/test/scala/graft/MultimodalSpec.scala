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
    assert(frames(3L) == 1L) // degenerate duration still yields frame 0
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
}
