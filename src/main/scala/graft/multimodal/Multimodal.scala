package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with the decode / feature-extract step running batched inside
  * `mapPartitions`.
  *
  * The IMAGE path is a real codec: [[imageMedia]] encodes genuine PNG
  * payloads, [[decodeImageFeatures]] reads width/height/channels back out
  * of the bytes with `javax.imageio` (PNG/JPEG/GIF/BMP readers ship with
  * the JDK), and [[resizeImages]] is a real decode → bilinear scale →
  * re-encode. The AUDIO path is real too: [[audioMedia]] writes genuine
  * RIFF/WAVE PCM containers and [[decodeAudioFeatures]] parses
  * frames/rate/channels/bits back out with `javax.sound.sampled`. The
  * MULTI-FRAME path is real as well: [[videoMedia]] writes genuine
  * animated GIFs through `javax.imageio`'s sequence writer and
  * [[sampleFrames]] decodes every k-th frame back OUT OF THE BYTES with
  * `ImageReader.read(i)` — GIF standing in for video containers, whose
  * codecs don't ship in the JDK; a production lane swaps the codec call,
  * not the explode topology. [[decodeFeatures]]/[[resizeStub]] remain as
  * the clearly-marked deterministic-fake lane demonstrating the plumbing
  * shape for codecs that need external libraries.
  */
object Multimodal {

  /** Media row schema: payload bytes + typed metadata struct. Here the
    * payload is the UTF-8 encoding of `text` (a stand-in blob the tests
    * can regenerate deterministically); in production it is the raw
    * image/audio bytes read from `spark.read.format("binaryFile")`.
    */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("mime"),
        col("source").as("origin")).as("meta"))

  /** Feature schema produced by the decode stub. */
  val FeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false)))

  /** STUB decoder — deterministic fake in place of a real codec.
    * A real implementation opens one decoder context per call and decodes
    * the whole batch through it; the fake derives "dimensions" purely from
    * the payload size so the oracle can mirror it in SQL.
    */
  private def decodeBatch(batch: Seq[(Long, String, Array[Byte])]): Seq[Row] =
    batch.map { case (id, mime, payload) =>
      val n = payload.length.toLong
      Row(id, mime, n, n % 640L, (n * 7L) % 480L)
    }

  /** Distributed batched decode: each partition drains in `batchSize`
    * groups through [[decodeBatch]] — the batch shape a vectorized codec
    * (or a `mapInPandas`-style Arrow batch) needs. No driver involvement.
    */
  def decodeFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("meta.mime"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { g =>
          decodeBatch(g.map(r => (r.getLong(0), r.getString(1), r.getAs[Array[Byte]](2))))
        }
      }
    spark.createDataFrame(rdd, FeatureSchema)
  }

  // ── real image codec (javax.imageio) ──────────────────────────────────

  /** Media frame with REAL PNG payloads: per doc, a genuine
    * `width × height` RGB image (dims derived from `doc_id`, pixels a
    * deterministic function of (doc_id, x, y)) encoded through
    * `ImageIO.write` on the executors. The derivation keys the SQL
    * oracle: the graded query must recover these dims FROM THE BYTES, so
    * a broken encode or decode hash-mismatches.
    */
  def imageMedia(docs: DataFrame, maxW: Int = 64, maxH: Int = 48): DataFrame = {
    val spark = docs.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("origin", StringType, nullable = true))), nullable = false)))
    val rdd = docs.select(col("doc_id"), col("source")).rdd.mapPartitions { rows =>
      // in-memory payloads: ImageIO's default stream cache is a TEMP FILE
      // per write — a disk round trip per image dominates small-image
      // encode cost. (JVM-global flag; all graft codec paths want it off.)
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val w = 1 + (id % maxW).toInt
        val h = 1 + (id % maxH).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        // write straight into the BGR raster: setRGB would run the sRGB
        // color-model conversion per pixel
        val data = img.getRaster.getDataBuffer
          .asInstanceOf[java.awt.image.DataBufferByte].getData
        var y = 0
        var p = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = ((id * 31 + x * 7 + y * 13) & 0xffffff).toInt
            data(p) = (rgb & 0xff).toByte
            data(p + 1) = ((rgb >> 8) & 0xff).toByte
            data(p + 2) = ((rgb >> 16) & 0xff).toByte
            p += 3
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Row(id, out.toByteArray, Row("image/png", r.getString(1)))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Feature schema of the real decode: dims/channels are null when the
    * payload doesn't decode (truncated file, unknown format) — corrupt
    * inputs yield gradeable nulls, not task failures.
    */
  val ImageFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("channels", LongType, nullable = true)))

  /** REAL batched decode: each batch drains through `javax.imageio`,
    * reading width/height/channel-count out of the actual payload bytes.
    * Same partition-parallel `mapPartitions` topology as the stub path —
    * no driver involvement, one in-memory decode per row, batch grouping
    * preserved for codecs that amortize context setup.
    */
  def decodeImageFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("meta.mime"), col("payload")).rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.grouped(batchSize).flatMap(_.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          // NonFatal, not just IOException: ImageIO plugins throw unchecked
          // exceptions (IllegalArgumentException, NegativeArraySizeException,
          // CMMException) on some corrupt/truncated headers — those payloads
          // must yield gradeable null dims, not task failures.
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
            catch { case scala.util.control.NonFatal(_) => null }
          if (img == null)
            Row(r.getLong(0), r.getString(1), payload.length.toLong, null, null, null)
          else
            Row(r.getLong(0), r.getString(1), payload.length.toLong,
              img.getWidth.toLong, img.getHeight.toLong,
              img.getRaster.getNumBands.toLong)
        })
      }
    spark.createDataFrame(rdd, ImageFeatureSchema)
  }

  /** REAL image resize: decode → `Graphics2D` bilinear scale → PNG
    * re-encode, all in-JDK, batched per partition like the decode path.
    * Payloads that don't decode are dropped (count them upstream via
    * [[decodeImageFeatures]]'s null dims if a dead-letter lane is
    * needed). Output payloads are genuine PNGs of exactly `w × h`.
    */
  def resizeImages(media: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    require(w > 0 && h > 0)
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val in =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            catch { case scala.util.control.NonFatal(_) => null } // plugin unchecked throws too
          if (in == null) None
          else {
            val out = resizeBilinear(in, w, h,
              java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
            val bytes = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bytes)
            Some(Row(r.getLong(0), w.toLong, h.toLong, bytes.toByteArray))
          }
        })
      }
    spark.createDataFrame(rdd, ResizedSchema)
  }

  // ── real audio codec (javax.sound.sampled, WAV/PCM) ───────────────────

  /** Media frame with REAL WAV payloads: per doc, a genuine mono 16-bit
    * PCM RIFF/WAVE file (frame count derived from `doc_id`, samples a
    * deterministic sine-ish integer function) written through
    * `AudioSystem.write` on the executors. Like [[imageMedia]], the
    * derivation keys the SQL oracle: the graded query must recover
    * frames/rate/channels FROM THE BYTES.
    */
  def audioMedia(docs: DataFrame, rateHz: Int = 8000, maxFrames: Int = 2048): DataFrame = {
    require(rateHz > 0 && maxFrames > 0)
    val spark = docs.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("origin", StringType, nullable = true))), nullable = false)))
    val rdd = docs.select(col("doc_id"), col("source")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val nFrames = 1 + (id % maxFrames).toInt
        val pcm = new Array[Byte](nFrames * 2)
        var i = 0
        while (i < nFrames) {
          val s = ((id * 131 + i * 17) % 65536 - 32768).toShort
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(rateHz.toFloat, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
        val out = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
        Row(id, out.toByteArray, Row("audio/wav", r.getString(1)))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Audio feature schema: null acoustics when the payload isn't a
    * parseable audio container.
    */
  val AudioFeatureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = true),
    StructField("sample_rate", LongType, nullable = true),
    StructField("channels", LongType, nullable = true),
    StructField("bits", LongType, nullable = true)))

  /** REAL batched audio decode: frame count, sample rate, channel count
    * and sample width read back out of the container header by
    * `javax.sound.sampled.AudioSystem` — same mapPartitions topology as
    * the image decode.
    */
  def decodeAudioFeatures(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("meta.mime"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val parsed =
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.BufferedInputStream(
                  new java.io.ByteArrayInputStream(payload)))
              try {
                val f = ais.getFormat
                Some((ais.getFrameLength, f.getSampleRate.toLong,
                  f.getChannels.toLong, f.getSampleSizeInBits.toLong))
              } finally ais.close()
            } catch { case scala.util.control.NonFatal(_) => None } // incl. unchecked parser throws
          parsed match {
            case Some((nf, rate, ch, bits)) =>
              Row(r.getLong(0), r.getString(1), payload.length.toLong, nf, rate, ch, bits)
            case None =>
              Row(r.getLong(0), r.getString(1), payload.length.toLong, null, null, null, null)
          }
        })
      }
    spark.createDataFrame(rdd, AudioFeatureSchema)
  }

  // ── perceptual audio fingerprinting (energy-envelope hash, real WAV) ──

  /** WAV media carrying a duration-robust identity pattern — the audio
    * twin of [[blockPatternMedia]]: 16 constant-amplitude blocks with
    * `A(b) = 300 + 150·(b ⊕ nib) + 4000·bit_b(id)` (nib = id & 15), so
    * the ENERGY ENVELOPE encodes 20 bits of `doc_id` with inter-block
    * energy gaps far above any resampling interpolation error, and
    * within-block windows tie EXACTLY (constant samples stay constant
    * under linear interpolation — no rounding can flip a tie).
    */
  def blockToneMedia(docs: DataFrame, nFrames: Int = 2080,
                     rateHz: Int = 8000): DataFrame = {
    require(nFrames >= 16 && rateHz > 0)
    val spark = docs.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        Row(id, encodePcm(blockToneSamples(id, nFrames), rateHz.toFloat))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Pure block-tone sample generator behind [[blockToneMedia]] —
    * depends on `id`'s low 16 bits only, so the exhaustive-residue
    * invariance spec drives the exact executor-side samples.
    */
  private[graft] def blockToneSamples(id: Long, nFrames: Int): Array[Int] = {
    val samples = new Array[Int](nFrames)
    var i = 0
    while (i < nFrames) {
      val b = i * 16 / nFrames
      samples(i) = 300 + 150 * (b ^ (id & 15L).toInt) +
        4000 * ((id >>> b) & 1L).toInt
      i += 1
    }
    samples
  }

  /** REAL audio resample: decode the WAV, linear-interpolate the PCM to
    * `factor`× the frame count, re-encode — the duration-changing
    * transform a fingerprint must survive. Payloads that do not decode
    * are dropped.
    */
  def resampleAudio(media: DataFrame, factor: Int = 2,
                    batchSize: Int = 64): DataFrame = {
    require(factor >= 2)
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          decodePcm(r.getAs[Array[Byte]](1)) match {
            case None => None
            case Some((samples, rate)) =>
              Some(Row(r.getLong(0), encodePcm(resampleLinear(samples, factor), rate)))
          }
        })
      }
    spark.createDataFrame(rdd, schema)
  }

  /** 64-bit energy-envelope fingerprint over REAL decoded PCM: split the
    * clip into 65 equal windows, take each window's MEAN-square energy
    * (mean, not sum — window-length roundoff must not create false
    * gradients), bit w = (E(w+1) > E(w)) — the audio analogue of
    * [[dHash64]]: invariant to uniform amplitude scaling and to
    * duration/rate changes, because the window grid is relative to the
    * clip length. Payloads that do not decode are dropped.
    */
  def audioFingerprint64(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("afp", LongType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          decodePcm(r.getAs[Array[Byte]](1)) match {
            case None => None
            case Some((samples, _)) if samples.length >= 65 =>
              Some(Row(r.getLong(0), envelopeFingerprint(samples)))
            case _ => None
          }
        })
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Pure linear interpolation behind [[resampleAudio]]. */
  private[graft] def resampleLinear(samples: Array[Int], factor: Int): Array[Int] = {
    val n = samples.length
    val out = new Array[Int](n * factor)
    var i = 0
    while (i < n * factor) {
      val pos = i.toDouble / factor
      val lo = pos.toInt
      val hi = math.min(lo + 1, n - 1)
      val frac = pos - lo
      out(i) = math.round(samples(lo) * (1.0 - frac) + samples(hi) * frac).toInt
      i += 1
    }
    out
  }

  /** Pure 64-bit energy-envelope hash behind [[audioFingerprint64]]:
    * 65 equal windows, mean-square energy per window, bit w =
    * (E(w+1) > E(w)).
    */
  private[graft] def envelopeFingerprint(samples: Array[Int]): Long = {
    val n = samples.length
    val e = new Array[Double](65)
    var w = 0
    while (w < 65) {
      val from = (w.toLong * n / 65).toInt
      val to = ((w + 1).toLong * n / 65).toInt
      var s = 0.0
      var i = from
      while (i < to) { s += samples(i).toDouble * samples(i); i += 1 }
      e(w) = if (to > from) s / (to - from) else 0.0
      w += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (e(k + 1) > e(k)) bits |= 1L << k
      k += 1
    }
    bits
  }

  /** Near-duplicate AUDIO pairs within Hamming `maxDist` of their
    * envelope fingerprints — the same value-collapsed matcher as
    * [[imageNearDuplicates]]; container bytes never cross a shuffle.
    */
  def audioNearDuplicates(media: DataFrame, maxDist: Int = 3,
                          hotBandThreshold: Int = 4096): DataFrame =
    collapsedSignaturePairs(
      audioFingerprint64(media)
        .select(col("doc_id").as("sh_id"), col("afp").as("simhash")),
      maxDist, hotBandThreshold)

  /** Decode a WAV payload to (16-bit signed samples of channel 0, rate);
    * None when the payload is not parseable audio.
    */
  private def decodePcm(payload: Array[Byte]): Option[(Array[Int], Float)] =
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.BufferedInputStream(new java.io.ByteArrayInputStream(payload)))
      try {
        val f = ais.getFormat
        if (f.getSampleSizeInBits != 16 || f.isBigEndian) None
        else {
          val raw = ais.readAllBytes()
          val step = f.getFrameSize
          val n = raw.length / step
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) = ((raw(i * step + 1) << 8) | (raw(i * step) & 0xff))
            i += 1
          }
          Some((out, f.getSampleRate))
        }
      } finally ais.close()
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Encode 16-bit samples as a mono PCM WAV at `rateHz`. */
  private def encodePcm(samples: Array[Int], rateHz: Float): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rateHz, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val out = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  val ResizedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false)))

  /** STUB resize — a 1→1 batched transform with a byte-payload output,
    * the plumbing shape of a real image resize (decode → scale →
    * re-encode). The fake "resample" keeps every k-th byte so output size
    * tracks the target dimensions deterministically.
    */
  def resizeStub(media: DataFrame, w: Int, h: Int, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val target = math.max(1, w * h / 64)
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val step = math.max(1, bytes.length / target)
          val out = bytes.indices.by(step).map(bytes).toArray
          Row(r.getLong(0), w.toLong, h.toLong, out)
        })
      }
    spark.createDataFrame(rdd, ResizedSchema)
  }

  // ── perceptual image hashing (dHash over REAL decoded pixels) ─────────

  /** Media frame of REAL PNGs carrying a scale-robust identity pattern:
    * a 4×4 grid of constant blocks encoding 20 bits of `doc_id` —
    * `v(b) = 8·(b ⊕ nib) + 128·bit_b(id)` with `nib = id & 15`
    * permuting the base ramp (so adjacent-block gradient SIGNS vary per
    * id even where the high bits agree) and the 128-plane carrying bits
    * 0..15. All sixteen values are distinct and ≥ 8 gray levels apart,
    * so downsampling never creates gradient ties that rounding could
    * flip. Unlike [[imageMedia]]'s per-pixel noise (which no perceptual
    * hash should survive resizing of), this content is what perceptual
    * dedup is FOR: the same picture at a different size must hash the
    * same. The derivation keys the graded recall gate: dHash(original)
    * must equal dHash(its 2× resized re-encode) within the band budget.
    */
  def blockPatternMedia(docs: DataFrame, w: Int = 32, h: Int = 24): DataFrame = {
    require(w >= 8 && h >= 8, "pattern needs at least 2 px per 4x4 block")
    val spark = docs.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val img = renderBlockImage(id, w, h)
        val out = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", out)
        Row(id, out.toByteArray)
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** The scale-robust 4×4 block value shared by [[blockPatternMedia]] and
    * [[videoPatternMedia]]: `v(b) = 8·(b ⊕ nib) + 128·bit_b(key)` with
    * `nib = key & 15` — sixteen distinct values ≥ 8 gray levels apart, so
    * downsampling never creates gradient ties rounding could flip. The
    * pattern depends on `key`'s LOW 16 BITS only, which is what lets
    * MultimodalInvarianceSpec certify resize-invariance by exhausting all
    * 65536 residues (pure function, no Spark).
    */
  private[graft] def blockValue16(key: Long, b: Int): Int =
    8 * (b ^ (key & 15L).toInt) + (((key >>> b) & 1L) << 7).toInt

  /** Pure renderer of the [[blockValue16]] grid — extracted so the
    * exhaustive-residue property test drives the exact executor-side
    * pixels without a cluster.
    */
  private[graft] def renderBlockImage(key: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val data = img.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val b = (y * 4 / h) * 4 + (x * 4 / w)
        data(y * w + x) = blockValue16(key, b).toByte
        x += 1
      }
      y += 1
    }
    img
  }

  /** Pure bilinear resize shared by [[resizeImages]]/[[resizeVideoFrames]]
    * and the invariance spec — the exact Graphics2D call the executors
    * run.
    */
  private[graft] def resizeBilinear(in: java.awt.image.BufferedImage, w: Int, h: Int,
                                    imageType: Int): java.awt.image.BufferedImage = {
    val out = new java.awt.image.BufferedImage(w, h, imageType)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(in, 0, 0, w, h, null)
    } finally g.dispose()
    out
  }

  /** 64-bit difference hash over the REAL decoded pixels: decode, bilinear
    * resample to 9×8 grayscale, then bit k = (p(x+1,y) > p(x,y)) over the
    * 8×8 horizontal gradients — the classic scale/format-invariant
    * perceptual signature (the same picture re-encoded or resized hashes
    * to the same or nearly-same 64 bits; unrelated pictures differ in
    * many). Partition-parallel mapPartitions like every codec lane;
    * payloads that do not decode are dropped.
    */
  def dHash64(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val in =
            try javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            catch { case scala.util.control.NonFatal(_) => null }
          if (in == null) None
          else Some(Row(r.getLong(0), dhashOf(in)))
        })
      }
    spark.createDataFrame(rdd, schema)
  }

  /** The dHash core shared by [[dHash64]] (whole images) and
    * [[frameDHash64]] (every frame of a container): bilinear 9×8 gray
    * resample, then 64 horizontal-gradient bits.
    */
  private[graft] def dhashOf(in: java.awt.image.BufferedImage): Long = {
    val small = new java.awt.image.BufferedImage(
      9, 8, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val g = small.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(in, 0, 0, 9, 8, null)
    } finally g.dispose()
    val px = small.getRaster.getDataBuffer
      .asInstanceOf[java.awt.image.DataBufferByte].getData
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if ((px(y * 9 + x + 1) & 0xff) > (px(y * 9 + x) & 0xff))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Near-duplicate IMAGE pairs within Hamming distance `maxDist` of
    * their dHashes — the VALUE-COLLAPSED perceptual matcher shared by
    * all three media lanes ([[collapsedSignaturePairs]]): payload bytes
    * never cross the shuffle, 8-byte signatures do, and candidate
    * volume scales with the signature VOCABULARY rather than the image
    * count (perceptual hashes repeat heavily on real corpora —
    * re-encodes, crops of the same picture, blank frames).
    */
  def imageNearDuplicates(media: DataFrame, maxDist: Int = 3,
                          hotBandThreshold: Int = 4096): DataFrame =
    collapsedSignaturePairs(
      dHash64(media).select(col("doc_id").as("sh_id"), col("dhash").as("simhash")),
      maxDist, hotBandThreshold)

  /** The perceptual pair matcher shared by the image/audio/video lanes
    * (r13): perceptual signatures repeat heavily at corpus scale
    * (re-encoded copies hash IDENTICALLY by design, and blank/boiler
    * frames collide across unrelated media), so a banded self-join over
    * the raw signature frame goes quadratic in that multiplicity —
    * measured 8× on the video lane at sf0.1. Instead: (a)
    * EQUAL-signature pairs come straight from the bounded equal-key
    * machinery on the hash value (hot values tile through SkewJoin; the
    * output is exactly the true 0-distance match set), and (b) the
    * banded near-join runs over DISTINCT signature VALUES only — its
    * input is the signature vocabulary, not the media count — and
    * re-expands through two equi-joins. Same pair set as the direct
    * banded join (equal and near paths are disjoint by construction),
    * output (id_a < id_b, hamming).
    */
  private[graft] def collapsedSignaturePairs(sigs: DataFrame, maxDist: Int,
                                             hotBandThreshold: Int): DataFrame = {
    val s = graft.CachePool.persist(sigs.select(col("sh_id"), col("simhash")))
    val eq = graft.operators.SkewJoin
      .boundedSelfPairs(s, Seq("simhash"), col("sh_id"), col("simhash"),
        hotBandThreshold)
      .select(col("id_a"), col("id_b"), lit(0).cast("int").as("hamming"))
    val vp = graft.dedup.SimHash.pairsFromSignatures(
        s.select("simhash").distinct()
          .select(col("simhash").as("sh_id"), col("simhash").as("simhash")),
        maxDist, hotBandThreshold)
      .select(col("id_a").as("v_a"), col("id_b").as("v_b"), col("hamming"))
    val near = s.select(col("sh_id").as("ia"), col("simhash").as("v_a"))
      .join(vp, "v_a")
      .join(s.select(col("sh_id").as("ib"), col("simhash").as("v_b")), "v_b")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"), col("hamming"))
    eq.unionByName(near).orderBy("id_a", "id_b")
  }

  // ── real multi-frame codec (javax.imageio GIF, the video stand-in) ────

  /** Media frame with REAL multi-frame containers: per doc, a genuine
    * animated GIF whose frame count AND per-frame dimensions derive from
    * `doc_id` — `n_frames = 1 + doc_id % maxFrames`, frame `i` is a
    * `(1 + (doc_id + i) % 16) × (1 + (doc_id·3 + i) % 12)` grayscale
    * image — written executor-side through `javax.imageio`'s GIF sequence
    * writer (`prepareWriteSequence`/`writeToSequence`). Like
    * [[imageMedia]]/[[audioMedia]], the derivation keys the SQL oracle:
    * the graded query must recover frame count and every sampled frame's
    * dimensions FROM THE CONTAINER BYTES, so a broken encode or decode
    * hash-mismatches. GIF is the JDK's only in-box multi-frame container;
    * a production video lane swaps the codec call, not the topology.
    */
  def videoMedia(docs: DataFrame, maxFrames: Int = 12): DataFrame = {
    require(maxFrames > 0)
    val spark = docs.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false),
      StructField("meta", StructType(Seq(
        StructField("mime", StringType, nullable = false),
        StructField("origin", StringType, nullable = true))), nullable = false)))
    val rdd = docs.select(col("doc_id"), col("source")).rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file stream cache
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      // dispose at task completion, not iterator exhaustion: a downstream
      // limit()/take() stops draining mid-partition and a lazily-appended
      // cleanup would never run
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => writer.dispose()))
      rows.map { r =>
        val id = r.getLong(0)
        val nFrames = 1 + (id % maxFrames).toInt
        val buf = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
        try {
          writer.reset() // reusable across docs: clear prior output/sequence state
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var i = 0
          while (i < nFrames) {
            val w = 1 + ((id + i) % 16).toInt
            val h = 1 + ((id * 3 + i) % 12).toInt
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var p = 0
            while (p < data.length) {
              data(p) = ((id * 31 + i * 7 + p) & 0xff).toByte
              p += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            i += 1
          }
          writer.endWriteSequence()
        } finally ios.close()
        Row(id, buf.toByteArray, Row("image/gif", r.getString(1)))
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Frame-sample schema: one row per SAMPLED frame, dims read from the
    * decoded frame itself. `n_frames` is the container's full frame count
    * (from the same byte parse), carried on every row.
    */
  val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  /** REAL frame sampling — the 1→N batched shape of video decode, now
    * backed by an actual container parse: each payload's frame count is
    * read with `ImageReader.getNumImages`, and every `everyN`-th frame is
    * DECODED OUT OF THE BYTES with `ImageReader.read(i)`, its dimensions
    * taken from the decoded `BufferedImage`. Payloads that don't parse as
    * a multi-frame container are dropped (dead-letter them upstream via a
    * probe lane if they must be accounted for). Partition-parallel, one
    * reader per partition, no driver involvement.
    */
  def sampleFrames(media: DataFrame, everyN: Int = 4, batchSize: Int = 16): DataFrame = {
    require(everyN > 0)
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.dispose()))
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(bytes))
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              (0 until n by everyN).map { i =>
                val img = reader.read(i)
                Row(id, i.toLong, img.getWidth.toLong, img.getHeight.toLong, n.toLong)
              }
            } finally iis.close()
          } catch {
            // corrupt/non-GIF payloads are data, not exceptions
            case scala.util.control.NonFatal(_) => Nil
          }
        })
      }
    spark.createDataFrame(rdd, FrameSchema)
  }

  // ── perceptual VIDEO dedup over the real multi-frame codec ────────────

  /** Animated GIFs whose frames carry an 8×8 grid of pseudo-random gray
    * cells keyed by a mixed per-(doc, frame, cell) hash. The 8×8 grid
    * aligns with dHash's 9×8 resample, so ALL 64 gradient comparisons
    * carry entropy and frame hashes are fully diverse — a lower-entropy
    * pattern family (e.g. 4×4 blocks, where only the 3 block boundaries
    * per row contribute signs) yields ~12 effective dHash bits and
    * collapses the banded signature join into quadratic hot buckets.
    * Cells are ≥3 px at the 32×24 default, which is what survives
    * bilinear resizing. `n_frames = 1 + doc_id % maxFrames`. GIF
    * palettes are lossless for ≤256 gray levels, so decoded pixels equal
    * the pattern exactly.
    */
  /** Shared renderer for the synthetic block-pattern GIF lanes
    * (videoPatternMedia / sceneVideoMedia): `frameKeys(id)` decides the
    * clip's per-frame 64-bit pattern keys, `pixel` the per-frame
    * rendering ([[structuredPixel]] for the resize-exact dedup lane,
    * [[noisePixel]] for the scene lane's entropy contract); one
    * reader-reusable ImageIO writer per partition. One home for the
    * codec scaffolding (code-review r11: the two lanes previously
    * duplicated it).
    */
  private def blockPatternGifs(docs: DataFrame, w: Int, h: Int,
                               pixel: (Long, Int, Int, Int, Int) => Int)(
      frameKeys: Long => Array[Long]): DataFrame = {
    require(w >= 8 && h >= 8)
    val spark = docs.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = docs.select(col("doc_id")).rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => writer.dispose()))
      rows.map { r =>
        val id = r.getLong(0)
        val keys = frameKeys(id)
        val buf = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
        try {
          writer.reset()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < keys.length) {
            val key = keys(f)
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
            val data = img.getRaster.getDataBuffer
              .asInstanceOf[java.awt.image.DataBufferByte].getData
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                data(y * w + x) = pixel(key, x, y, w, h).toByte
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
        } finally ios.close()
        Row(id, buf.toByteArray)
      }
    }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Block-pattern clips for the video-dedup lane: `1 + (id % maxFrames)`
    * frames, a FRESH pattern key per (id, frame) — splitmix-style mix —
    * rendered as the STRUCTURED [[blockValue16]] 4×4 grid (r13: the same
    * scale-robust pattern the image lane certifies over all 65536
    * residues). The previous 8×8 noise grid put near-equal values in
    * adjacent blocks, so a few frames drifted past Hamming 3 under 2×
    * bilinear resize and the video gate could only be a declared
    * planted-recovery boolean; with the structured grid per-frame dHash
    * survives resize EXACTLY (MultimodalInvarianceSpec exhausts the
    * residues), so q_video_dedup's matched count restates like the
    * image/audio lanes. Distinct frame keys still differ in many dHash
    * bits (16 pattern bits drive strong gradients), which is all the
    * frame-grain matching needs.
    */
  def videoPatternMedia(docs: DataFrame, maxFrames: Int = 6,
                        w: Int = 32, h: Int = 24): DataFrame = {
    require(maxFrames > 0)
    blockPatternGifs(docs, w, h, structuredPixel) { id =>
      val n = 1 + (id % maxFrames).toInt
      Array.tabulate(n) { f =>
        var key = id * -7046029254386353131L + f * -4417276706812531889L
        key ^= key >>> 31; key *= -7723592293110705685L; key ^= key >>> 33
        key
      }
    }
  }

  /** Per-pixel renderers for [[blockPatternGifs]] — pure functions of
    * (frame key, x, y, w, h). `structuredPixel` is the resize-exact
    * [[blockValue16]] 4×4 grid (video dedup); `noisePixel` is the 8×8
    * splitmix grid whose ~independent 64-bit dHashes the scene-cut lane's
    * entropy contract leans on (cross-scene distance ≈ random draws).
    */
  private[graft] val structuredPixel: (Long, Int, Int, Int, Int) => Int =
    (key, x, y, w, h) => blockValue16(key, (y * 4 / h) * 4 + (x * 4 / w))

  private[graft] val noisePixel: (Long, Int, Int, Int, Int) => Int =
    (key, x, y, w, h) => {
      val b = (y * 8 / h) * 8 + (x * 8 / w)
      var kb = key + b * -4417276706812531889L
      kb ^= kb >>> 31; kb *= -7723592293110705685L; kb ^= kb >>> 33
      (kb & 0xffL).toInt
    }

  /** Re-encode every frame of a multi-frame container at `factor×` size
    * (bilinear) — the "same video, different resolution" transform a
    * perceptual pipeline must see through. Real decode → real resize →
    * real re-encode, one reader+writer pair per partition.
    */
  def resizeVideoFrames(media: DataFrame, factor: Int = 2,
                        batchSize: Int = 16): DataFrame = {
    require(factor > 0)
    val spark = media.sparkSession
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ =>
            reader.dispose(); writer.dispose()
          })
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            try {
              reader.setInput(iis, false, true)
              val n = reader.getNumImages(true)
              val buf = new java.io.ByteArrayOutputStream()
              val ios = javax.imageio.ImageIO.createImageOutputStream(buf)
              try {
                writer.reset()
                writer.setOutput(ios)
                writer.prepareWriteSequence(null)
                var i = 0
                while (i < n) {
                  val in = reader.read(i)
                  val out = resizeBilinear(in, in.getWidth * factor,
                    in.getHeight * factor,
                    java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
                  writer.writeToSequence(new javax.imageio.IIOImage(out, null, null), null)
                  i += 1
                }
                writer.endWriteSequence()
              } finally ios.close()
              Some(Row(id, buf.toByteArray))
            } finally iis.close()
          } catch {
            case scala.util.control.NonFatal(_) => None
          }
        })
      }
    spark.createDataFrame(rdd, mediaSchema)
  }

  /** Per-FRAME perceptual signatures: every frame of every container
    * decoded and dHashed — (doc_id, frame_idx, dhash). The frame grain is
    * what video near-dup matching joins on; payload bytes stay inside the
    * partition, only 8-byte hashes leave.
    */
  def frameDHash64(media: DataFrame, batchSize: Int = 16): DataFrame = {
    val spark = media.sparkSession
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("frame_idx", LongType, nullable = false),
      StructField("dhash", LongType, nullable = false)))
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        javax.imageio.ImageIO.setUseCache(false)
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => reader.dispose()))
        rows.grouped(batchSize).flatMap(_.flatMap { r =>
          val id = r.getLong(0)
          try {
            val iis = javax.imageio.ImageIO.createImageInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            try {
              reader.setInput(iis, false, true)
              (0 until reader.getNumImages(true)).map(i =>
                Row(id, i.toLong, dhashOf(reader.read(i))))
            } finally iis.close()
          } catch {
            case scala.util.control.NonFatal(_) => Nil
          }
        })
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Near-duplicate VIDEO pairs: frame-level dHash signatures (frame
    * identity packed as `doc_id · 1024 + frame_idx`), matched frame
    * pairs rolled up per video pair, and a video pair kept when ≥
    * `minFrac` of the LOWER-id video's frames match some frame of the
    * other — the majority-of-frames rule that tolerates trims and title
    * cards.
    *
    * Frame matching goes through the shared value-collapsed matcher
    * ([[collapsedSignaturePairs]] — frames repeat signatures heavily:
    * re-encodes, black/title frames, and this lane's 16-bit planted
    * patterns, where the raw banded self-join measured 8× slower).
    * 8-byte keys shuffle, payloads never do.
    */
  def videoNearDuplicates(media: DataFrame, maxDist: Int = 3,
                          minFrac: Double = 0.9,
                          hotBandThreshold: Int = 4096): DataFrame = {
    // frame identity packs as doc_id·1024 + frame_idx below, which is
    // only injective for non-negative ids and <1024 frames — containers
    // beyond frame 1023 (and malformed negative ids) are excluded HERE,
    // before the signature frame, so n_frames and the match rollup stay
    // consistent: matching considers each video's first 1024 frames.
    val fp = graft.CachePool.persist(frameDHash64(media)
      .filter(col("doc_id") >= 0 && col("frame_idx") < 1024))
    val pairs = collapsedSignaturePairs(
      fp.select((col("doc_id") * 1024L + col("frame_idx")).as("sh_id"),
        col("dhash").as("simhash")),
      maxDist, hotBandThreshold)
    val va = expr("id_a div 1024"); val fa = pmod(col("id_a"), lit(1024L))
    val vb = expr("id_b div 1024"); val fb = pmod(col("id_b"), lit(1024L))
    val norm = pairs
      .select(va.as("va"), fa.as("fa"), vb.as("vb"), fb.as("fb"))
      .filter(col("va") =!= col("vb"))
      .select(
        least(col("va"), col("vb")).as("vid_a"),
        greatest(col("va"), col("vb")).as("vid_b"),
        when(col("va") < col("vb"), col("fa")).otherwise(col("fb")).as("frame_lo"))
    val counts = norm.groupBy("vid_a", "vid_b")
      .agg(countDistinct(col("frame_lo")).as("n_matched"))
    val nf = fp.groupBy("doc_id").agg(count(lit(1)).as("n_frames"))
    counts
      .join(nf.withColumnRenamed("doc_id", "vid_a"), "vid_a")
      .filter(col("n_matched") >= col("n_frames") * minFrac)
      .select("vid_a", "vid_b", "n_matched", "n_frames")
      .orderBy("vid_a", "vid_b")
  }

  /** Scene-structured animated GIFs for the scene-cut lane: each doc's
    * clip has `1 + (id % 3)` SCENES of `framesPerScene` IDENTICAL frames
    * (within-scene dHash distance exactly 0 — the frames are
    * byte-identical renders), and each scene draws a fresh block pattern
    * from the (id, scene) mix, so consecutive cross-scene frames differ
    * like independent 64-bit patterns. Everything derives from doc_id —
    * the oracle restates frame/scene/cut-index expectations from the
    * same arithmetic, and since the payloads are a pure function of id,
    * a detection threshold that holds at a scale factor holds forever.
    */
  def sceneVideoMedia(docs: DataFrame, framesPerScene: Int = 2,
                      w: Int = 32, h: Int = 24): DataFrame = {
    require(framesPerScene > 0)
    blockPatternGifs(docs, w, h, noisePixel) { id =>
      val nScenes = 1 + (id % 3).toInt
      (0 until nScenes).flatMap { sc =>
        var key = id * -7046029254386353131L + sc * -2862933555777941757L
        key ^= key >>> 31; key *= -7723592293110705685L; key ^= key >>> 33
        Seq.fill(framesPerScene)(key)
      }.toArray
    }
  }

  /** SCENE-CUT detection + keyframe report — the segmentation step a
    * video training pipeline runs between decode and sampling: per-frame
    * dHash, consecutive-frame Hamming distance via one per-video lag
    * window, a cut wherever the distance exceeds `maxIntraDist`
    * (within-scene perceptual drift passes under it; a genuine scene
    * change flips ~half the 64 bits). Output per video: frame count,
    * detected scene count (#cuts + 1), and the first cut's frame index
    * (-1 when the clip is a single scene — the keyframe seed a sampler
    * starts from). Payloads never shuffle: only (doc_id, frame_idx,
    * dhash) rows reach the window, partitioned per video.
    */
  def sceneCuts(media: DataFrame, maxIntraDist: Int = 8): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("frame_idx")
    frameDHash64(media)
      .withColumn("__prev", lag(col("dhash"), 1).over(w))
      .withColumn("__cut", col("__prev").isNotNull &&
        bit_count(col("__prev").bitwiseXOR(col("dhash"))) > maxIntraDist)
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_frames"),
        (sum(when(col("__cut"), 1L).otherwise(0L)) + 1L).as("n_scenes"),
        coalesce(min(when(col("__cut"), col("frame_idx"))), lit(-1L))
          .as("first_cut_idx"))
      .orderBy("doc_id")
  }
}
