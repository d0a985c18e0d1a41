package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The greedy BPE encode core shared by [[BpeEncodeCount]] and
  * [[BpeEncodeSymbols]]: seed a word into characters (or UTF-8 bytes),
  * then repeatedly apply the LOWEST-RANK applicable merge, all its
  * occurrences left to right — the classic greedy encode (Sennrich,
  * Haddow & Birch, ACL 2016), matching how the table was trained
  * ([[graft.text.Vocab.bpeMerges]]).
  */
private[functions] final class BpeCodec(
    merges: Seq[(String, String)], byteLevel: Boolean) extends Serializable {

  @transient private lazy val rankOf: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      // symbols come from a \s+ split, so a SPACE can never occur
      // inside one — the provably safe pair separator
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  /** Seed symbols: UTF-16 units (char level) or UTF-8 bytes mapped to
    * chars 0-255 (byte level — the GPT-2-style unicode-robust seeding;
    * whitespace never survives tokenization and no UTF-8 byte of a
    * non-whitespace character equals 0x20, so the space separator stays
    * safe at both levels).
    */
  private def seed(word: String): Array[String] =
    if (byteLevel) {
      val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new Array[String](bs.length)
      var i = 0
      while (i < bs.length) { out(i) = String.valueOf((bs(i) & 0xFF).toChar); i += 1 }
      out
    } else {
      val out = new Array[String](word.length)
      var i = 0
      while (i < word.length) { out(i) = String.valueOf(word.charAt(i)); i += 1 }
      out
    }

  /** The word's symbol array at the merge table's fixpoint. */
  def encode(word: String): Array[String] = {
    var syms = seed(word)
    if (syms.length < 2 || merges.isEmpty) return syms
    var i = 0
    var n = syms.length
    while (true) {
      var best = Int.MaxValue
      i = 0
      while (i + 1 < n) {
        val r = rankOf.get(syms(i) + " " + syms(i + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        i += 1
      }
      if (best == Int.MaxValue) return java.util.Arrays.copyOf(syms, n)
      val (l, r) = merges(best)
      val out = new Array[String](n)
      var o = 0
      i = 0
      while (i < n) {
        if (i + 1 < n && syms(i) == l && syms(i + 1) == r) {
          out(o) = l + r; o += 1; i += 2
        } else { out(o) = syms(i); o += 1; i += 1 }
      }
      syms = out
      n = o
    }
    syms // unreachable
  }

  /** Symbol count only — same loop without materializing the copy. */
  def encodeCount(word: String): Long = encode(word).length.toLong
}

/** Distributed BPE ENCODING: apply a trained merge table
  * ([[graft.text.Vocab.bpeMerges]]) to a document's word array and count
  * the resulting symbols — the true token count a packing/budgeting
  * stage needs once a tokenizer exists. The merge table rides inside the
  * expression (bounded — it IS the tokenizer, ≤ vocab-size entries), so
  * encoding is a pure per-row map: no join, no shuffle, and the
  * expression stays inside the WholeStageCodegen span (generated code
  * calls [[BpeEncodeCount.nullSafeEval]] via a reference object, the
  * same delegation every graft native expression uses).
  *
  * With an EMPTY table the count degenerates to the corpus character
  * count, which is what the oracle replays; a longer table never
  * increases the count (lowest-rank-first makes the shorter table's
  * fixpoint an intermediate state of the longer one's).
  */
case class BpeEncodeCount(child: Expression, merges: Seq[(String, String)],
                          byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode_count expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = LongType

  @transient private lazy val codec = new BpeCodec(merges, byteLevel)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var total = 0L
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i))
        total += codec.encodeCount(arr.getUTF8String(i).toString)
      i += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BpeEncodeCount].getName
    val ref = ctx.addReferenceObj("bpeEnc", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Long) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeCount =
    copy(child = newChild)
}

/** The encode that KEEPS the symbols: a document's word array → the
  * concatenated array of its words' BPE symbols under the trained table
  * (order-preserving; concatenating a word's symbols recovers the word
  * at char level). This is the subword token stream itself — the input
  * to subword-aware feature spaces (bucket hashing over symbols instead
  * of whitespace words) and to any id-mapping stage. Same pure-map
  * contract as [[BpeEncodeCount]]:
  * `size(bpe_encode(w, t)) == bpe_encode_count(w, t)` by construction.
  */
case class BpeEncodeSymbols(child: Expression, merges: Seq[(String, String)],
                            byteLevel: Boolean = false)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects array<string>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  @transient private lazy val codec = new BpeCodec(merges, byteLevel)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val syms = codec.encode(arr.getUTF8String(i).toString)
        var j = 0
        while (j < syms.length) { out += UTF8String.fromString(syms(j)); j += 1 }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BpeEncodeSymbols].getName
    val ref = ctx.addReferenceObj("bpeEncSym", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncodeSymbols =
    copy(child = newChild)
}

object BpeExprs {

  /** Total BPE symbol count of an array<string> of words under the given
    * rank-ordered merge table.
    */
  def encodeCount(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeCount(ColumnBridge.expression(words), merges))

  /** Byte-level variant: seed symbols are UTF-8 bytes, so the 0-merge
    * count equals the corpus UTF-8 byte count on ANY text (no BMP/astral
    * caveat) — the unicode-robust form production byte-BPE uses.
    */
  def encodeCountBytes(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncodeCount(ColumnBridge.expression(words), merges, byteLevel = true))

  /** The symbol stream itself: array<string> of words → array<string> of
    * BPE symbols (all words, order preserved).
    */
  def encodeSymbols(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeEncodeSymbols(ColumnBridge.expression(words), merges))

  /** Byte-level symbol stream. */
  def encodeSymbolsBytes(words: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(
      BpeEncodeSymbols(ColumnBridge.expression(words), merges, byteLevel = true))
}
