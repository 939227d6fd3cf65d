package graft.multimodal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  private def media() = df("path STRING, length BIGINT, content BINARY",
    Row("a.jpg", 5L, Array[Byte](1, 2, 3, 4, 5)),
    Row("b.jpg", 3L, Array[Byte](9, 8, 7)),
    Row("c.mp4", 8L, Array[Byte](1, 1, 2, 2, 3, 3, 4, 4)))

  test("withMetadata attaches the typed media_meta struct") {
    val out = Multimodal.withMetadata(media())
    val meta = out.schema("media_meta").dataType
    assert(meta == Multimodal.mediaMetaSchema)
    val r = out.filter(col("path") === "a.jpg")
      .select(col("media_meta.width"), col("media_meta.height"),
        col("media_meta.n_channels")).collect()(0)
    assert(r.getInt(0) >= 64 && r.getInt(1) >= 64 && r.getInt(2) == 3)
  }

  test("metadata is deterministic per payload") {
    val a = Multimodal.withMetadata(media()).select("media_meta.width")
      .collect().map(_.getInt(0))
    val b = Multimodal.withMetadata(media()).select("media_meta.width")
      .collect().map(_.getInt(0))
    assert(a.sameElements(b))
  }

  test("extractFeatures: fixed-dim float vector per payload") {
    val out = Multimodal.extractFeatures(media(), dim = 16)
    val vecs = out.select(col("media_embedding")).collect()
      .map(_.getSeq[Float](0))
    assert(vecs.forall(_.length == 16))
    assert(vecs(0) != vecs(1)) // different payloads -> different features
  }

  test("resize rewrites payload and refreshes metadata") {
    val out = Multimodal.resize(media(), 32, 32)
    assert(out.columns.contains("media_meta"))
    val lens = out.select(length(col("content"))).collect()
      .map(_.getInt(0))
    assert(lens.forall(_ >= 1))
  }

  test("sampleFrames explodes video into n frame rows with indices") {
    val vid = media().filter(col("path") === "c.mp4")
    val out = Multimodal.sampleFrames(vid, n = 4)
    assert(out.count() == 4)
    val idx = out.select(col("frame_index")).collect()
      .map(_.getLong(0)).sorted
    assert(idx.sameElements(Array(0L, 1L, 2L, 3L)))
    // frames partition the payload (stub semantics: stride slices)
    val frames = out.select(col("frame")).collect()
      .map(_.getAs[Array[Byte]](0))
    assert(frames.forall(_.nonEmpty))
  }
}
