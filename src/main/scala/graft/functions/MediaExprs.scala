package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Container-header sniffing as NATIVE Catalyst expressions — the
  * metadata fast path of multimodal ingest. A 100 TB media crawl does not
  * full-decode every payload to learn its dimensions: PNG carries
  * width/height/channels in the fixed-offset IHDR chunk and RIFF/WAVE
  * carries rate/channels/bits/frames in its `fmt `/`data` chunks, so the
  * probe reads tens of BYTES per row. As expressions (not RDD
  * `mapPartitions`, not UDFs) these stay inside WholeStageCodegen, run
  * unchanged in Structured Streaming, and never force a full
  * `javax.imageio`/`AudioSystem` decode — that full-decode path
  * ([[graft.multimodal.Multimodal]]) remains the pixel/sample-accurate
  * slow lane the probe gates admission to.
  *
  * Both return NULL (not an error) on anything that isn't their
  * container — sniffing IS the classifier, and at corpus scale malformed
  * payloads are data, not exceptions.
  */
case class PngInfo(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"png_info expects binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("bit_depth", LongType, nullable = false)))

  override def nullable: Boolean = true

  private def be32(b: Array[Byte], i: Int): Long =
    ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Array[Byte]])

  /** Public so the generated Java (an unrelated Janino class, which cannot
    * see the protected `nullSafeEval`) can call it directly.
    */
  def probe(b: Array[Byte]): InternalRow = {
    // 8-byte signature + IHDR length/type (8) + 13-byte IHDR body
    if (b.length < 29) return null
    val sigOk = (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G' && b(4) == 0x0d && b(5) == 0x0a && b(6) == 0x1a && b(7) == 0x0a
    if (!sigOk) return null
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return null
    val colorType = b(25) & 0xff
    val channels = colorType match {
      case 0 => 1L // grayscale
      case 2 => 3L // truecolor
      case 3 => 1L // palette index
      case 4 => 2L // gray + alpha
      case 6 => 4L // truecolor + alpha
      case _ => return null
    }
    new GenericInternalRow(Array[Any](
      be32(b, 16), be32(b, 20), channels, (b(24) & 0xff).toLong))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pngInfo", this, classOf[PngInfo].getName)
    val code = nullSafeCodeGen(ctx, ev, c =>
      s"""Object r = $ref.probe($c);
         |if (r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r;
         |}""".stripMargin)
    code
  }

  override protected def withNewChildInternal(newChild: Expression): PngInfo =
    copy(child = newChild)
}

/** RIFF/WAVE header walk: sample rate, channels, bits per sample and
  * frame count out of the `fmt ` and `data` chunks. Chunk order is not
  * fixed by the spec, so this walks the chunk list with bounds checks;
  * PCM and non-PCM format tags both carry the fields read here.
  */
case class WavInfo(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"wav_info expects binary, got ${t.simpleString}")
  }

  override def dataType: DataType = StructType(Seq(
    StructField("sample_rate", LongType, nullable = false),
    StructField("channels", LongType, nullable = false),
    StructField("bits", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false)))

  override def nullable: Boolean = true

  private def le16(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], i: Int, s: String): Boolean =
    b(i) == s.charAt(0) && b(i + 1) == s.charAt(1) &&
      b(i + 2) == s.charAt(2) && b(i + 3) == s.charAt(3)

  override protected def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[Array[Byte]])

  /** Public so the generated Java (an unrelated Janino class, which cannot
    * see the protected `nullSafeEval`) can call it directly. All offset
    * arithmetic is in Long: a malformed chunk size near Int.MaxValue must
    * terminate the walk (NULL result), not overflow into a negative index.
    */
  def probe(b: Array[Byte]): InternalRow = {
    if (b.length < 12 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    var off = 12L
    var rate = -1L; var ch = -1L; var bits = -1L; var blockAlign = -1L
    var dataSize = -1L
    while (off + 8 <= b.length && (rate < 0 || dataSize < 0)) {
      val i = off.toInt
      val size = le32(b, i + 4)
      val body = off + 8
      if (tag(b, i, "fmt ")) {
        if (body + 16 > b.length) return null
        val bi = body.toInt
        ch = le16(b, bi + 2)
        rate = le32(b, bi + 4)
        blockAlign = le16(b, bi + 12)
        bits = le16(b, bi + 14)
      } else if (tag(b, i, "data")) {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      off = body + size + (size & 1L)
    }
    if (rate <= 0 || ch <= 0 || bits <= 0 || blockAlign <= 0 || dataSize < 0) null
    else new GenericInternalRow(Array[Any](rate, ch, bits, dataSize / blockAlign))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wavInfo", this, classOf[WavInfo].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"""Object r = $ref.probe($c);
         |if (r == null) { ${ev.isNull} = true; } else {
         |  ${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) r;
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): WavInfo =
    copy(child = newChild)
}

object MediaExprs {

  /** PNG IHDR probe: struct(width, height, channels, bit_depth), null if
    * the payload is not a PNG.
    */
  def pngInfo(payload: Column): Column =
    ColumnBridge.column(PngInfo(ColumnBridge.expression(payload)))

  /** RIFF/WAVE header probe: struct(sample_rate, channels, bits,
    * n_frames), null if the payload is not a WAV.
    */
  def wavInfo(payload: Column): Column =
    ColumnBridge.column(WavInfo(ColumnBridge.expression(payload)))
}
