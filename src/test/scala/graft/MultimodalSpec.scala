package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  test("media pipeline: binary payloads -> features -> resize -> rollup") {
    val out = Multimodal.mediaPipeline(spark, sf).collect()
    assert(out.map(_.getAs[String]("kind")).toSeq == Seq("audio", "image", "video"))
    assert(out.map(_.getAs[Long]("n_items")).sum == 300)
  }

  test("feature extraction is deterministic and correctly shaped") {
    val media = Multimodal.syntheticMedia(spark, 30)
    val f1 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.extractFeatures(media).collect().sortBy(_.media_id)
    assert(f1.map(_.content_hash).sameElements(f2.map(_.content_hash)))
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(f => f.decoded_width >= 64 && f.decoded_height >= 64))
    // videos sample multiple frames with stride; images exactly one
    assert(f1.filter(_.kind == "image").forall(_.n_frames_sampled == 1))
  }

  test("resize plan never upscales and preserves cap") {
    val feats = Multimodal.extractFeatures(Multimodal.syntheticMedia(spark, 50)).toDF()
    val resized = Multimodal.resizePlan(feats, maxSide = 128)
    val bad = resized.filter(
      col("target_width") > greatest(lit(128), col("decoded_width")) ||
        col("target_height") > greatest(lit(128), col("decoded_height")))
    assert(bad.isEmpty)
  }
}
