package graft

import org.apache.spark.sql.functions._

import graft.llm.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val media = Multimodal.asMedia(
    Tables.load(spark, sf0, "documents")
      .withColumn("bin", col("text").cast("binary")),
    "doc_id", "bin", "image", "image/png").cache()

  test("asMedia produces the typed media schema") {
    assert(media.schema.fieldNames.toSeq ==
      Seq("media_id", "modality", "content", "mime_type", "byte_size"))
    assert(media.filter($"byte_size" <= 0).isEmpty)
    // byte_size is the UTF-8 octet length of the content bytes
    val r = media.select(octet_length($"content") === $"byte_size")
      .as[Boolean].collect()
    assert(r.forall(identity))
  }

  test("decode stub yields one fixed-shape feature row per media item") {
    val feats = Multimodal.decodeImagesStub(media, featureDim = 8)
    assert(feats.count() == media.count())
    assert(feats.schema.fieldNames.toSeq ==
      Seq("media_id", "width", "height", "n_channels", "feature"))
    import org.apache.spark.sql.Row
    feats.collect().foreach { r: Row =>
      assert(r.getInt(1) >= 64 && r.getInt(2) >= 64)
      assert(r.getSeq[Float](4).size == 8)
    }
    // determinism: same bytes → same features
    val f2 = Multimodal.decodeImagesStub(media, featureDim = 8)
    assert(feats.exceptAll(f2).isEmpty)
  }

  test("resize stub clamps the longer side and preserves aspect floor") {
    val out = Multimodal.resizeStub(
      Multimodal.decodeImagesStub(media), maxSide = 128)
    assert(out.filter($"out_width" > 128 || $"out_height" > 128).isEmpty)
    assert(out.filter($"out_width" <= 0 || $"out_height" <= 0).isEmpty)
  }

  test("frame sampling emits n evenly spaced in-range frame indices") {
    val frames = Multimodal.sampleFramesStub(media, n = 4)
    assert(frames.count() == media.count() * 4)
    assert(frames.filter($"frame_index" < 0 ||
      $"frame_index" >= $"frame_count").isEmpty)
  }
}
