package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with the decode / feature-extract step running batched inside
  * `mapPartitions`.
  *
  * The image/audio codecs are NOT in this container, so the decode is a
  * clearly-marked deterministic STUB — but the Spark-side plumbing is real:
  * schema (binary + struct metadata), partition-parallel batched execution
  * (one codec context per batch, like a real decoder would amortize), and
  * a columnar feature output. Swapping the stub for a real JNI/FFI decoder
  * changes only `decodeBatch`.
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

  val FrameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("frame_idx", LongType, nullable = false),
    StructField("frame", BinaryType, nullable = false)))

  /** STUB frame sampling — the 1→N batched shape of video decode: each
    * payload ("container") yields every `everyN`-th fixed-size chunk
    * ("frame"). A real decoder swaps the chunker for codec calls; the
    * partition-parallel explode topology is identical.
    */
  def frameSampleStub(media: DataFrame, frameBytes: Int = 64, everyN: Int = 4,
                      batchSize: Int = 16): DataFrame = {
    require(frameBytes > 0 && everyN > 0)
    val spark = media.sparkSession
    val rdd = media.select(col("doc_id"), col("payload")).rdd
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap(_.iterator.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val frames = bytes.grouped(frameBytes).toIndexedSeq
          frames.indices.by(everyN).map(i => Row(id, i.toLong, frames(i)))
        })
      }
    spark.createDataFrame(rdd, FrameSchema)
  }
}
