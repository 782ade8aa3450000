package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  import Multimodal._

  private def media() = mediaFromDocuments(graft.Tables(spark, sfDir).documents)

  test("media synthesis: binary payload column with kind metadata") {
    val m = media()
    assert(m.schema("payload").dataType.typeName == "binary")
    val kinds = m.toDF().select("kind").distinct().collect().map(_.getString(0)).toSet
    assert(kinds == Set("image", "audio", "video"))
  }

  test("decode: deterministic stub produces typed features with stable dims") {
    val d = decode(media())
    assert(d.columns.toSeq ==
      Seq("media_id", "kind", "width", "height", "n_frames", "feature"))
    val row = d.filter(col("media_id") === 0).collect()(0)
    // rerun → identical (stub is deterministic)
    val row2 = decode(media()).filter(col("media_id") === 0).collect()(0)
    assert(row.width == row2.width && row.height == row2.height)
    assert(d.filter(col("width") < 64 || col("width") >= 576).count() == 0)
    assert(d.filter(col("kind") =!= "video" && col("n_frames") =!= 1).count() == 0)
    assert(d.filter(size(col("feature")) =!= 8).count() == 0)
  }

  test("resize: caps the max dimension, preserves aspect floor") {
    val r = resize(decode(media()), maxDim = 128)
    assert(r.filter(col("width") > 128 || col("height") > 128).count() == 0)
    assert(r.filter(col("width") < 1 || col("height") < 1).count() == 0)
  }

  test("frame sampling explodes only video, stride-spaced") {
    val frames = sampleFrames(decode(media()), stride = 10)
    val nonVideo = frames.filter(col("kind") =!= "video")
    assert(nonVideo.filter(col("frame_idx") =!= 0).count() == 0)
    // every sampled index is a multiple of the stride
    assert(frames.filter(col("frame_idx") % 10 =!= 0).count() == 0)
    // videos with >=11 frames produce >1 sampled frame
    val deep = decode(media()).filter(col("kind") === "video" && col("n_frames") > 10)
      .select("media_id").collect().map(_.getLong(0)).toSet
    val sampledDeep = frames.groupBy("media_id").count()
      .filter(col("count") > 1).collect().map(_.getLong(0)).toSet
    assert(deep == sampledDeep)
  }

  test("mm_pipeline aggregates are exact byte accounting") {
    val df = mmPipeline.fn(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("audio", "image", "video"))
    assert(rows.map(_.getLong(1)).sum == graft.Tables(spark, sfDir).documents.count())
  }
}
