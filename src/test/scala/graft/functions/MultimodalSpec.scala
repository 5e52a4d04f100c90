package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def media(n: Int, mediaType: String = "image") =
    Multimodal.withFakeMedia(
      spark.range(1, n + 1).toDF("id"), "id", mediaType)

  test("fake media carries a binary column + typed metadata struct") {
    val df = media(10)
    assert(df.schema("content").dataType.typeName == "binary")
    val meta = df.select($"media_meta.*")
    assert(meta.columns.toSeq == Seq("mediaType", "sizeBytes", "width", "height", "nFrames"))
    assert(df.filter($"media_meta.width" < 16 || $"media_meta.height" < 16).count() == 0)
  }

  test("decodeMediaMeta round-trips the header; malformed bytes → null") {
    val df = media(20, "video")
    val bad = df.filter(
      Multimodal.decodeMediaMeta($"content")("width") =!= $"media_meta.width" ||
      Multimodal.decodeMediaMeta($"content")("nFrames") =!= $"media_meta.nFrames")
    assert(bad.count() == 0)
    val junk = Seq(Array[Byte](1, 2, 3)).toDF("content")
    assert(junk.select(Multimodal.decodeMediaMeta($"content")).head().isNullAt(0))
  }

  test("resizedDims clamps the long edge, preserves aspect, never upscales") {
    val df = Seq((2048, 1024), (100, 50), (512, 512)).toDF("w", "h")
    val got = df.select(Multimodal.resizedDims($"w", $"h", 512).as("r"))
      .select($"r.width", $"r.height").as[(Int, Int)].collect().toSeq
    assert(got == Seq((512, 256), (100, 50), (512, 512)))
  }

  test("frameSampleIndices bounds the sample count and covers the range") {
    val df = Seq(300, 5, 16).toDF("nFrames")
    val got = df.select(Multimodal.frameSampleIndices($"nFrames", 16).as("idx"))
      .as[Seq[Long]].collect()
    assert(got(0).size <= 16 && got(0).head == 0L && got(0).last < 300)
    assert(got(1) == Seq(0L, 1L, 2L, 3L, 4L))
  }

  test("extractFeatures: batched decode emits one row per valid payload, deterministic") {
    implicit val s = spark
    val df = media(100)
    val feats = Multimodal.extractFeatures(df, "id", batchSize = 7).collect()
    assert(feats.length == 100)
    assert(feats.forall(_.features.length == 8))
    val again = Multimodal.extractFeatures(df, "id", batchSize = 7).collect()
    assert(feats.map(_.features.toSeq).toSeq.sortBy(_.hashCode) ==
      again.map(_.features.toSeq).toSeq.sortBy(_.hashCode))
  }
}
