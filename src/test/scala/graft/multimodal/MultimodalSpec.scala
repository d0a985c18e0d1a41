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

  test("imageMedia plants REAL PNGs: magic bytes present, dims decode back exactly") {
    val docs = table("documents").limit(50)
    val m = Multimodal.imageMedia(docs)
    // PNG signature on every payload
    val sigs = m.select(col("payload")).collect().map(_.getAs[Array[Byte]](0).take(4))
    assert(sigs.forall(_.sameElements(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))))
    // decode recovers the planted derivation from the BYTES
    val feats = Multimodal.decodeImageFeatures(m, batchSize = 16)
    val bad = feats.filter(
      col("width") =!= lit(1) + col("doc_id") % 64 ||
        col("height") =!= lit(1) + col("doc_id") % 48 ||
        col("channels") =!= 3 || col("n_bytes") <= 0).count()
    assert(bad === 0L)
    assert(feats.count() === docs.count())
  }

  test("decodeImageFeatures round-trips an independently-encoded PNG and nulls corrupt bytes") {
    // a 7×5 PNG encoded right here, independent of imageMedia's derivation
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    val good = out.toByteArray
    val junk = Array.fill[Byte](32)(42)
    val media = Seq((1L, good), (2L, junk)).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("image/png").as("mime")))
    val got = Multimodal.decodeImageFeatures(media)
      .select("doc_id", "width", "height", "channels")
      .as[(Long, Option[Long], Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, Some(7L), Some(5L), Some(3L)), (2L, None, None, None)))
  }

  test("resizeImages re-encodes real PNGs at exactly the target dimensions") {
    val m = Multimodal.imageMedia(table("documents").limit(30))
    val resized = Multimodal.resizeImages(m, w = 16, h = 12)
    assert(resized.count() === 30L)
    // decode the RESIZED payloads independently: every one is a real
    // 16×12 PNG (not just a relabeled row)
    val redecoded = Multimodal.decodeImageFeatures(
      resized.select(col("doc_id"), col("payload"))
        .withColumn("meta", struct(lit("image/png").as("mime"))))
    assert(redecoded.filter(
      col("width") =!= 16 || col("height") =!= 12 || col("channels") =!= 3)
      .count() === 0L)
  }

  test("audioMedia plants REAL WAVs: RIFF magic, header fields decode back exactly") {
    val docs = table("documents").limit(40)
    val m = Multimodal.audioMedia(docs)
    val sigs = m.select(col("payload")).collect().map(_.getAs[Array[Byte]](0).take(4))
    assert(sigs.forall(_.sameElements("RIFF".getBytes("US-ASCII"))))
    val feats = Multimodal.decodeAudioFeatures(m, batchSize = 16)
    val bad = feats.filter(
      col("n_frames") =!= lit(1) + col("doc_id") % 2048 ||
        col("sample_rate") =!= 8000 || col("channels") =!= 1 ||
        col("bits") =!= 16 || col("n_bytes") <= 0).count()
    assert(bad === 0L)
    assert(feats.count() === docs.count())
  }

  test("decodeAudioFeatures nulls non-audio payloads instead of failing the task") {
    val junk = Seq((1L, Array.fill[Byte](64)(7))).toDF("doc_id", "payload")
      .withColumn("meta", struct(lit("audio/wav").as("mime")))
    val got = Multimodal.decodeAudioFeatures(junk)
      .select("n_frames", "sample_rate", "channels", "bits")
      .as[(Option[Long], Option[Long], Option[Long], Option[Long])].head()
    assert(got === ((None, None, None, None)))
  }

  test("resizeStub output payload size tracks the target dimensions") {
    val resized = Multimodal.resizeStub(media, w = 64, h = 64)
    assert(resized.count() === media.count())
    val sizes = resized.select(length(col("payload"))).as[Int].collect()
    // target = 64*64/64 = 64 sampled bytes (short docs keep every byte)
    assert(sizes.forall(s => s > 0 && s <= 700))
  }

  test("dHash64 is scale-invariant on block patterns and discriminates distinct ids") {
    val docs = table("documents").limit(50)
    val orig = Multimodal.blockPatternMedia(docs)
    // exact byte copies hash identically (decode determinism)
    val h1 = Multimodal.dHash64(orig).as[(Long, Long)].collect().toMap
    val h2 = Multimodal.dHash64(orig).as[(Long, Long)].collect().toMap
    assert(h1 === h2)
    assert(h1.size === 50)
    // 2x bilinear re-encodes: every copy within Hamming 3 of its original
    val copies = Multimodal.resizeImages(orig, 64, 48)
      .select((col("doc_id") + 1000L).as("doc_id"), col("payload"))
    val hc = Multimodal.dHash64(copies).as[(Long, Long)].collect().toMap
    val dists = h1.map { case (id, h) =>
      java.lang.Long.bitCount(h ^ hc(id + 1000L))
    }
    assert(dists.count(_ <= 3) === 50, s"distances: ${dists.toSeq.sorted.reverse.take(5)}")
    // discrimination, scoped to what a HORIZONTAL-gradient hash promises:
    // ids 0..49 differ in a handful of low blocks, and changes that only
    // alter vertical structure are invisible to dHash by construction —
    // so patterns cluster, but substantially and with the bulk of
    // cross-id pairs well outside the match radius
    assert(h1.values.toSet.size >= 15,
      s"expected substantial hash diversity, got ${h1.values.toSet.size}")
    val ids = h1.keys.toSeq.sorted
    val cross = for { i <- ids; j <- ids if i < j }
      yield java.lang.Long.bitCount(h1(i) ^ h1(j))
    assert(cross.count(_ <= 3) <= cross.size / 5,
      s"over 20% of cross-id pairs within radius: ${cross.count(_ <= 3)}/${cross.size}")
    val sorted = cross.sorted
    assert(sorted(sorted.size / 2) > 3, "median cross-id distance must exceed the radius")
  }

  test("imageNearDuplicates finds every planted scaled copy through the banded join") {
    val docs = table("documents").limit(40)
    val orig = Multimodal.blockPatternMedia(docs)
    val copies = Multimodal.resizeImages(orig, 64, 48)
      .select((col("doc_id") + 5000L).as("doc_id"), col("payload"))
    val pairs = Multimodal.imageNearDuplicates(
        orig.select("doc_id", "payload").unionByName(copies), maxDist = 3)
      .as[(Long, Long, Long)].collect()
    val planted = pairs.count { case (a, b, _) => a < 5000L && b - a == 5000L }
    assert(planted === 40)
  }

  test("audioFingerprint64 survives 2x linear resampling; junk and too-short clips drop") {
    val docs = table("documents").limit(40)
    val orig = Multimodal.blockToneMedia(docs)
    val h1 = Multimodal.audioFingerprint64(orig).as[(Long, Long)].collect().toMap
    assert(h1.size === 40)
    // deterministic
    assert(h1 === Multimodal.audioFingerprint64(orig).as[(Long, Long)].collect().toMap)
    // resampled copies stay within the match radius
    val copies = Multimodal.resampleAudio(orig, factor = 2)
      .select((col("doc_id") + 900L).as("doc_id"), col("payload"))
    val hc = Multimodal.audioFingerprint64(copies).as[(Long, Long)].collect().toMap
    val dists = h1.map { case (id, h) => java.lang.Long.bitCount(h ^ hc(id + 900L)) }
    assert(dists.count(_ <= 3) === 40, s"worst: ${dists.toSeq.sorted.reverse.take(5)}")
    // junk payloads and sub-65-frame clips are dropped, not failed
    val junk = Seq((1L, Array.fill[Byte](64)(9))).toDF("doc_id", "payload")
    assert(Multimodal.audioFingerprint64(junk).count() === 0)
  }

  test("audioNearDuplicates finds every planted resampled copy through the banded join") {
    val docs = table("documents").limit(30)
    val orig = Multimodal.blockToneMedia(docs)
    val copies = Multimodal.resampleAudio(orig, factor = 2)
      .select((col("doc_id") + 7000L).as("doc_id"), col("payload"))
    val pairs = Multimodal.audioNearDuplicates(orig.unionByName(copies), maxDist = 3)
      .as[(Long, Long, Long)].collect()
    val planted = pairs.count { case (a, b, _) => a < 7000L && b - a == 7000L }
    assert(planted === 30)
  }

  test("videoMedia plants REAL animated GIFs: magic bytes, frame count and dims decode back") {
    val docs = table("documents").limit(30)
    val m = Multimodal.videoMedia(docs)
    // GIF89a/GIF87a signature on every payload
    val sigs = m.select(col("payload")).collect().map(_.getAs[Array[Byte]](0).take(3))
    assert(sigs.forall(_.sameElements("GIF".getBytes("US-ASCII"))))
    // sampled frames recover the planted derivation FROM THE BYTES
    val frames = Multimodal.sampleFrames(m, everyN = 4)
    val bad = frames.filter(
      col("n_frames") =!= lit(1) + col("doc_id") % 12 ||
        col("width") =!= lit(1) + (col("doc_id") + col("frame_idx")) % 16 ||
        col("height") =!= lit(1) + (col("doc_id") * 3 + col("frame_idx")) % 12 ||
        col("frame_idx") % 4 =!= 0).count()
    assert(bad === 0L)
    // every doc contributes ceil(n_frames / 4) sampled frames
    val perDoc = frames.groupBy("doc_id").agg(count(lit(1)).as("n"),
        first(col("n_frames")).as("nf"))
      .filter(col("n") =!= ceil(col("nf") / lit(4.0)).cast("long")).count()
    assert(perDoc === 0L)
  }

  test("sampleFrames round-trips an independently-encoded GIF and drops junk payloads") {
    // a 3-frame GIF encoded right here, independent of videoMedia's derivation
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val buf = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    Seq((9, 4), (5, 6), (2, 3)).foreach { case (w, h) =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val media = Seq((1L, buf.toByteArray), (2L, Array.fill[Byte](48)(13)))
      .toDF("doc_id", "payload")
    val got = Multimodal.sampleFrames(media, everyN = 1)
      .select("doc_id", "frame_idx", "width", "height", "n_frames")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq((1L, 0L, 9L, 4L, 3L), (1L, 1L, 5L, 6L, 3L), (1L, 2L, 2L, 3L, 3L)))
  }

  test("videoPatternMedia frames carry distinct per-frame dHashes; resize preserves them") {
    val docs = table("documents").limit(40)
    val orig = Multimodal.videoPatternMedia(docs)
    val fp = Multimodal.frameDHash64(orig)
    // frame counts follow the derivation
    val badN = fp.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .filter(col("n") =!= lit(1L) + pmod(col("doc_id"), lit(6L))).count()
    assert(badN === 0L)
    // per-video frames are dHash-distinctive (pattern key varies per frame):
    // most multi-frame videos carry >1 distinct frame hash
    val multi = fp.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("dhash")).as("d"))
      .filter(col("n") > 1)
    assert(multi.filter(col("d") > 1).count() >= multi.count() * 8 / 10)
    // 2x bilinear re-encode: per-frame hashes within Hamming 3 of the original
    val resized = Multimodal.resizeVideoFrames(orig, factor = 2)
    val fp2 = Multimodal.frameDHash64(resized)
      .withColumnRenamed("dhash", "dhash2")
    val joined = fp.join(fp2, Seq("doc_id", "frame_idx"))
    assert(joined.count() === fp.count())
    val far = joined.filter(
      bit_count(col("dhash").bitwiseXOR(col("dhash2"))) > 3).count()
    assert(far <= fp.count() / 10, s"$far of ${fp.count()} frames moved > 3 bits")
  }

  test("videoNearDuplicates recovers planted rescaled copies, majority-of-frames rule") {
    val docs = table("documents").limit(60)
    val off = 1000000L
    val orig = Multimodal.videoPatternMedia(docs)
    val copies = Multimodal.resizeVideoFrames(orig, factor = 2)
      .select((col("doc_id") + off).as("doc_id"), col("payload"))
    val dups = Multimodal.videoNearDuplicates(
      orig.unionByName(copies), maxDist = 3, minFrac = 0.9)
    val n = docs.count()
    val planted = dups.filter(col("vid_a") < off && col("vid_b") === col("vid_a") + off)
    assert(planted.count() >= n * 9 / 10, s"recovered ${planted.count()} of $n")
    // matched-frame counts never exceed the lower video's frame total
    assert(dups.filter(col("n_matched") > col("n_frames")).count() === 0L)
  }
}
