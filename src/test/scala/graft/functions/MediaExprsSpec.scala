package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Unit coverage for the header-sniff expressions: real containers round
  * trip, junk yields NULL, and — the regression this suite pins — a
  * malformed WAV claiming a chunk size near Int.MaxValue terminates the
  * chunk walk with NULL instead of overflowing the offset into a negative
  * array index and failing the task.
  */
class MediaExprsSpec extends SparkSpec {
  import spark.implicits._

  private def realPng(w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  private def realWav(nFrames: Int, rateHz: Int): Array[Byte] = {
    val pcm = new Array[Byte](nFrames * 2)
    val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("pngInfo recovers IHDR fields from a real PNG; junk is NULL") {
    val df = Seq((1L, realPng(13, 7)), (2L, Array.fill[Byte](64)(42)))
      .toDF("id", "payload")
      .select(col("id"), MediaExprs.pngInfo(col("payload")).as("p"))
    val got = df.select(col("id"), col("p.width"), col("p.height"), col("p.channels"))
      .as[(Long, Option[Long], Option[Long], Option[Long])].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, Some(13L), Some(7L), Some(3L)), (2L, None, None, None)))
  }

  test("wavInfo recovers rate/channels/bits/frames from a real WAV; junk is NULL") {
    val df = Seq((1L, realWav(321, 8000)), (2L, Array.fill[Byte](64)(7)))
      .toDF("id", "payload")
      .select(col("id"), MediaExprs.wavInfo(col("payload")).as("w"))
    val got = df.select(col("id"), col("w.sample_rate"), col("w.channels"),
        col("w.bits"), col("w.n_frames"))
      .as[(Long, Option[Long], Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, Some(8000L), Some(1L), Some(16L), Some(321L)),
      (2L, None, None, None, None)))
  }

  test("wavInfo: chunk size near Int.MaxValue yields NULL, not an offset overflow") {
    // hand-built RIFF/WAVE whose first chunk claims ~2^31 bytes: the walk
    // must conclude (NULL — no fmt/data found in bounds), not wrap the
    // offset negative and throw ArrayIndexOutOfBoundsException
    val b = new java.io.ByteArrayOutputStream()
    b.write("RIFF".getBytes("US-ASCII")); b.write(Array[Byte](36, 0, 0, 0))
    b.write("WAVE".getBytes("US-ASCII"))
    b.write("junk".getBytes("US-ASCII"))
    b.write(Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0x7f)) // 0x7ffffff8
    b.write(new Array[Byte](16)) // some body bytes, far fewer than claimed
    val evil = b.toByteArray
    val got = Seq((1L, evil)).toDF("id", "payload")
      .select(MediaExprs.wavInfo(col("payload")).as("w"))
      .select(col("w.sample_rate")).as[Option[Long]].head()
    assert(got === None)
    // and the direct probe agrees (interpreted path)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    assert(WavInfo(ColumnBridge.expression(lit(evil))).probe(evil) === null)
  }

  test("probe helpers are public and agree with the expression results") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val png = realPng(5, 4)
    val row = PngInfo(ColumnBridge.expression(lit(png))).probe(png)
    assert(row.getLong(0) === 5L && row.getLong(1) === 4L && row.getLong(2) === 3L)
    val wav = realWav(10, 16000)
    val wrow = WavInfo(ColumnBridge.expression(lit(wav))).probe(wav)
    assert(wrow.getLong(0) === 16000L && wrow.getLong(3) === 10L)
  }
}
