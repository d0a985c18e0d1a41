package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for corpus preparation. Spark has no built-in
  * NFC/NFD/NFKC, and the usual escape hatch (a Scala UDF) breaks codegen
  * and serializes through the encoder; this is a plain expression around
  * `java.text.Normalizer` (JDK, deterministic, no external dep).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  @transient private lazy val normForm = Normalizer.Form.valueOf(form)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"unicode_normalize expects string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (Normalizer.isNormalized(s, normForm)) input
    else UTF8String.fromString(Normalizer.normalize(s, normForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[UnicodeNormalize].getName
    val ref = ctx.addReferenceObj("unorm", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)
}

object StringExprs {

  /** Normalize to the given Unicode form ("NFC", "NFD", "NFKC", "NFKD"). */
  def unicodeNormalize(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(c), form))

  /** Strip diacritics: NFD-decompose, then drop combining marks. */
  def stripAccents(c: Column): Column =
    regexp_replace(unicodeNormalize(c, "NFD"), "\\p{M}+", "")

  /** Remove C0/C1 control characters (keep \t \n \r). */
  def stripControlChars(c: Column): Column =
    regexp_replace(c, "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F-\\x9F]", "")
}
