package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Dot product of two float-vector columns, accumulated in double.
  *
  * A native Catalyst expression with `doGenCode`: the loop compiles into
  * the surrounding WholeStageCodegen stage and reads the unsafe array
  * buffers directly. The higher-order-function formulation
  * (`aggregate(zip_with(...))`) is interpreted per element and allocates
  * an intermediate array per row — ~50× slower on the KNN hot path where
  * the dot runs once per candidate pair.
  */
case class VecDotF(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot_f expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x(i).toDouble * y(i).toDouble
      i += 1
    }
    s
  }

  // Vectorized-friendly form: one bulk extract per operand (a single
  // Platform.copyMemory for UnsafeArrayData — no per-element virtual
  // getFloat calls), then a tight primitive float[] loop HotSpot can
  // auto-vectorize. The accumulator stays double, so results are
  // bit-identical to the per-element form (same widening, same order).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |float[] $xs = $a.toFloatArray();
         |float[] $ys = $b.toFloatArray();
         |int $n = java.lang.Math.min($xs.length, $ys.length);
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (double) $xs[$i] * (double) $ys[$i];
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): VecDotF =
    copy(left = newLeft, right = newRight)
}

/** Asymmetric-distance (ADC) score for product-quantized search: given a
  * row's code array (one centroid id per subspace) and a query's
  * per-subspace lookup table of partial dots, sum lut[j][codes[j]] over
  * the m subspaces — the hottest inner loop of PQ/OPQ/IVF-PQ search, run
  * once per (query, candidate).
  *
  * The HOF formulation `aggregate(zip_with(codes, lut, element_at...))`
  * allocates a zipped struct array per row and interprets both lambdas
  * per element; this is one codegen'd loop of m array reads, bit-identical
  * (same left-to-right double accumulation of the same lookups).
  */
case class AdcScore(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(IntegerType, _), ArrayType(ArrayType(DoubleType, _), _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"adc_score expects (array<int>, array<array<double>>), got " +
        s"(${l.simpleString}, ${r.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = math.min(codes.numElements(), lut.numElements())
    var s = 0.0
    var j = 0
    while (j < m) {
      s += lut.getArray(j).getDouble(codes.getInt(j))
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val m = ctx.freshName("m")
      val j = ctx.freshName("j")
      val s = ctx.freshName("s")
      s"""
         |int $m = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $j = 0; $j < $m; $j++) {
         |  $s += $b.getArray($j).getDouble($a.getInt($j));
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): AdcScore =
    copy(left = newLeft, right = newRight)
}

/** Σ weights(b) over an array<long> of feature-bucket ids — the linear
  * scoring pass of a bag-of-buckets model (fastText-shaped classifiers:
  * Joulin et al. 2016): the weight vector rides inside the expression
  * (bounded — it IS the model, `buckets` doubles), so scoring is a pure
  * per-row map, no join or shuffle. Out-of-range ids contribute 0 rather
  * than throwing — the model owns [0, buckets) by construction.
  */
case class BucketDot(child: Expression, weights: Array[Double])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bucket_dot expects array<long>, got ${t.simpleString}")
  }

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var s = 0.0
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val b = arr.getLong(i)
        if (b >= 0 && b < weights.length) s += weights(b.toInt)
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[BucketDot].getName
    val ref = ctx.addReferenceObj("bdot", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (Double) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDot =
    copy(child = newChild)
}

/** Squared-L2 distance between two SQ8 code arrays (array<byte>) — the
  * per-pair hot op of scalar-quantized KNN. Pure integer arithmetic
  * (max per-term (255)² · 64 dims ≪ 2⁶³, so a long accumulator is exact),
  * which is the point of SQ8: the oracle can replay the distance bit-for-bit
  * and the inner loop is add/sub/mul on bytes — no FP at all. Codegen'd
  * like [[VecDotF]]: one bulk extract per operand, then a tight
  * primitive loop HotSpot can auto-vectorize.
  */
case class Sq8DistL2(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(ByteType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sq8_dist_l2 expects two array<tinyint> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toByteArray()
    val y = b.asInstanceOf[ArrayData].toByteArray()
    // A dimension mismatch means the wrong code table was paired with the
    // query side (e.g. a stale artifact load); truncating would return
    // plausible-looking distances, so fail hard instead (ADVICE r15).
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"sq8_dist_l2: code length mismatch (${x.length} vs ${y.length})")
    val n = x.length
    var s = 0L
    var i = 0
    while (i < n) {
      val d = x(i) - y(i)
      s += (d * d).toLong
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xs = ctx.freshName("xs")
      val ys = ctx.freshName("ys")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val dd = ctx.freshName("d")
      s"""
         |byte[] $xs = $a.toByteArray();
         |byte[] $ys = $b.toByteArray();
         |if ($xs.length != $ys.length) {
         |  throw new IllegalArgumentException(
         |    "sq8_dist_l2: code length mismatch (" + $xs.length + " vs " + $ys.length + ")");
         |}
         |int $n = $xs.length;
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  int $dd = $xs[$i] - $ys[$i];
         |  $s += (long) ($dd * $dd);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Sq8DistL2 =
    copy(left = newLeft, right = newRight)
}

object VecOps {

  /** Codegen'd float-vector dot product (double accumulator). */
  def dotF(a: Column, b: Column): Column =
    ColumnBridge.column(VecDotF(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** L2 norm of a float vector. */
  def normF(a: Column): Column = sqrt(dotF(a, a))

  /** Unit-normalized copy of a float vector (float elements, so downstream
    * dots stay on the fast float path). Zero vectors pass through as-is.
    */
  def normalizeF(a: Column): Column = {
    val n = normF(a)
    when(n === 0.0, a).otherwise(transform(a, x => (x / n).cast("float")))
  }

  /** Cosine similarity via one codegen'd pass per operand pair. */
  def cosineF(a: Column, b: Column): Column =
    dotF(a, b) / normF(a) / normF(b)

  /** A driver-side float array as an array<float> literal column (the form
    * index centroids/hyperplanes ship to executors in).
    */
  def litVecF(c: Array[Float]): Column = array(c.map(lit).toIndexedSeq: _*)

  /** Codegen'd ADC lookup-sum: Σ_j lut[j][codes[j]] over the subspaces. */
  def adcScore(codes: Column, lut: Column): Column =
    ColumnBridge.column(AdcScore(
      ColumnBridge.expression(codes), ColumnBridge.expression(lut)))

  /** Σ weights(b) over an array<long> of bucket ids (see [[BucketDot]]). */
  def bucketDot(buckets: Column, weights: Array[Double]): Column =
    ColumnBridge.column(BucketDot(ColumnBridge.expression(buckets), weights))

  /** Fixed-point SQ8 quantization of a float vector: ⌊x·2^scaleBits⌋
    * clamped to [-128, 127], as array<byte> — 4× smaller than the floats.
    * Power-of-two scale + floor keep it EXACT in double (float widening
    * is lossless, ·2^k shifts the exponent), so an out-of-engine replay
    * computes identical codes from the same raw floats. Runs once per
    * row (not per pair), so the built-in `transform` is fine here; the
    * per-pair hot op is the codegen'd [[Sq8DistL2]].
    */
  def sq8F(a: Column, scaleBits: Int): Column = {
    val scale = math.pow(2.0, scaleBits)
    transform(a, x => greatest(lit(-128L), least(lit(127L),
      floor(x * lit(scale)).cast("long"))).cast("byte"))
  }

  /** Codegen'd exact integer squared-L2 over two SQ8 code arrays. */
  def sq8DistL2(a: Column, b: Column): Column =
    ColumnBridge.column(Sq8DistL2(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
