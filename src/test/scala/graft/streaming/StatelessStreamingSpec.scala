package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.{Chunker, UrlOps}

/** Pins the "runs unchanged in Structured Streaming" claims the
  * stateless-projection operators make in their docstrings: the SAME
  * library call that serves the batch path is applied to a readStream
  * frame and must (a) pass streaming analysis and (b) emit rows equal to
  * the batch run over the same data. Stateless projections (URL parse,
  * chunking, media header sniff) are the operators a 100 TB ingest keeps
  * identical across its batch backfill and its streaming head.
  */
class StatelessStreamingSpec extends SparkSpec {
  import spark.implicits._

  private def runToBatch(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val name = s"sls_${System.nanoTime()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name).collect().map(_.toString).sorted.toSeq
  }

  test("UrlOps.parseUrls runs unchanged on a stream and matches the batch rows") {
    val rows = Seq(
      (1L, "https://a.site.example/x/y"),
      (2L, "HTTP://b.other.example/z"),
      (3L, "not a url"))
    val input = MemoryStream[(Long, String)](spark)
    input.addData(rows: _*)
    val streamed = runToBatch(UrlOps.parseUrls(
      input.toDF().toDF("id", "url"), col("url")))
    val batch = UrlOps.parseUrls(rows.toDF("id", "url"), col("url"))
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(batch.size === 3)
  }

  test("Chunker.chunkTokens runs unchanged on a stream and matches the batch rows") {
    val rows = Seq(
      (1L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (2L, "short doc"))
    val input = MemoryStream[(Long, String)](spark)
    input.addData(rows: _*)
    val streamed = runToBatch(Chunker.chunkTokens(
      input.toDF().toDF("doc_id", "text"), col("doc_id"), col("text"), 16, 8))
    val batch = Chunker.chunkTokens(
        rows.toDF("doc_id", "text"), col("doc_id"), col("text"), 16, 8)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed === batch)
    assert(batch.size === 5) // 4 chunks for the 40-token doc + 1 short
  }

  test("MediaExprs header probes run unchanged on a binary stream") {
    val img = new java.awt.image.BufferedImage(6, 4,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val buf = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", buf)
    val rows = Seq((1L, buf.toByteArray), (2L, Array.fill[Byte](16)(3)))
    val input = MemoryStream[(Long, Array[Byte])](spark)
    input.addData(rows: _*)
    val streamed = runToBatch(
      input.toDF().toDF("id", "payload")
        .select(col("id"), graft.functions.MediaExprs.pngInfo(col("payload")).as("p"))
        .select(col("id"), col("p.width"), col("p.height")))
    assert(streamed === Seq("[1,6,4]", "[2,null,null]"))
  }
}
