package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.asMedia(table("documents"))

  test("asMedia carries the payload bytes and typed metadata") {
    val r = media.select(col("doc_id"), length(col("payload")).as("n"),
      col("meta.mime"), col("meta.origin")).limit(1).collect()(0)
    assert(r.getAs[String]("mime") === "text/plain")
    assert(r.getAs[Int]("n") > 0)
  }

  test("decodeFeatures derives dimensions from payload size, batched per partition") {
    val feats = Multimodal.decodeFeatures(media, batchSize = 32)
    val bad = feats.filter(
      col("width") =!= col("n_bytes") % 640 ||
        col("height") =!= (col("n_bytes") * 7) % 480).count()
    assert(bad === 0L)
    assert(feats.count() === media.count())
  }

  test("resizeStub output payload size tracks the target dimensions") {
    val resized = Multimodal.resizeStub(media, w = 64, h = 64)
    assert(resized.count() === media.count())
    val sizes = resized.select(length(col("payload"))).as[Int].collect()
    // target = 64*64/64 = 64 sampled bytes (short docs keep every byte)
    assert(sizes.forall(s => s > 0 && s <= 700))
  }

  test("frameSampleStub explodes each payload into every 4th fixed-size chunk") {
    val doc = media.filter(col("doc_id") === 0)
    val nBytes = doc.select(length(col("payload"))).as[Int].head()
    val frames = Multimodal.frameSampleStub(doc, frameBytes = 64, everyN = 4)
    val expected = Range(0, (nBytes + 63) / 64, 4).size
    assert(frames.count() === expected.toLong)
    assert(frames.select(min(col("frame_idx"))).as[Long].head() === 0L)
  }
}
