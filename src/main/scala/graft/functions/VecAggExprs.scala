package graft.functions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native MERGEABLE aggregates over vector columns — the fourth member of
  * the mergeable-summary family (HLL++ q_ndv_sketch, quantile sketch
  * q_group_quantiles_sketch, Count-Min q_cms_heavy_hitters): a fixed-size
  * buffer per group that partial-aggregates map-side and merges
  * associatively, so profiling a 100 TB embedding table is ONE corpus
  * pass whose exchange carries #groups × buffer bytes — never the
  * 64×rows explosion of the `posexplode → groupBy(dim)` formulation,
  * which shuffles one row PER ELEMENT.
  */
object VecAggExprs {

  /** Per-dimension integer-micros statistics of an `array<float>` column:
    * for each dim, (n, Σ⌊x·10⁶⌋, min⌊x·10⁶⌋, max⌊x·10⁶⌋) plus the SECOND
    * moment — Σ⌊x·10⁶⌋² carried as a base-10¹⁸ (hi, lo) long pair and the
    * exact variance numerator n·Σm² − (Σm)² (so per-dim variance is
    * varn / n² micros², the actual drift statistic) in the same split
    * form. Micros flooring makes every cell an exact, order-independent
    * integer — float→double widening is exact, ·10⁶ is one
    * correctly-rounded double op, floor is exact — so the aggregate is
    * replayable bit-for-bit by any engine and safe under Spark's
    * nondeterministic partial-merge order (a raw float sum would not be).
    * The (hi, lo) split is the overflow story: Σm² exceeds BIGINT beyond
    * ~9M rows of unit-scale vectors (m² ≤ 10¹² each), so the buffer
    * carries it as hi·10¹⁸ + lo with an add-time carry, and the oracle
    * replays both cells from HUGEINT division — no DECIMAL ever crosses
    * the engine boundary. Buffer: 1 + 5·dims longs. Rows whose vector
    * length ≠ `dims` fail loudly — a silent skip would corrupt the
    * profile; so does |m| > 2.867·10⁹ (a ±2867-magnitude element), the
    * largest m where m² plus a maximal pre-carry lo cell (10¹⁸−1) still
    * fits a long (m² ≤ 8.220·10¹⁸; 9e18 + 10¹⁸−1 would wrap).
    */
  def dimStatsMicros(emb: Column, dims: Int): Column =
    ColumnBridge.column(
      VecDimStatsAgg(ColumnBridge.expression(emb), dims).toAggregateExpression())
}

case class VecDimStatsAgg(
    child: Expression,
    dims: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dims > 0 && dims <= 4096, s"dims out of range: $dims")

  private val Carry = 1000000000000000000L // 10^18: lo-cell carry base
  private val CarryBig = BigInteger.valueOf(Carry)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_dim_stats expects array<float>, got ${t.simpleString}")
  }

  // layout: [0]=count, [1..dims]=sum_mu, [1+dims..]=min_mu, [1+2·dims..]=
  // max_mu, [1+3·dims..]=ssq_hi, [1+4·dims..]=ssq_lo (ssq = hi·10¹⁸ + lo)
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](1 + 5 * dims)
    var i = 0
    while (i < dims) {
      b(1 + dims + i) = Long.MaxValue
      b(1 + 2 * dims + i) = Long.MinValue
      i += 1
    }
    b
  }

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      if (arr.numElements() != dims) throw new IllegalStateException(
        s"vec_dim_stats: vector of length ${arr.numElements()} in a dims=$dims profile")
      b(0) += 1
      var i = 0
      while (i < dims) {
        val mu = math.floor(arr.getFloat(i).toDouble * 1e6).toLong
        if (mu > 2867000000L || mu < -2867000000L) throw new IllegalStateException(
          s"vec_dim_stats: |element micros| $mu > 2.867e9 (magnitude beyond " +
            "±2867) would overflow the exact second-moment cell")
        b(1 + i) += mu
        if (mu < b(1 + dims + i)) b(1 + dims + i) = mu
        if (mu > b(1 + 2 * dims + i)) b(1 + 2 * dims + i) = mu
        // mu² ≤ 2.867e9² ≈ 8.220·10¹⁸ and lo ≤ 10¹⁸−1 between rows, so
        // lo + mu² ≤ 9.220·10¹⁸ < 2⁶³−1 ≈ 9.223·10¹⁸ — the carry keeps the
        // pair canonical (lo < 10¹⁸) after every add. 3e9 would NOT be safe:
        // 9e18 + (10¹⁸−1) wraps (ADVICE r13).
        val lo = b(1 + 4 * dims + i) + mu * mu
        b(1 + 3 * dims + i) += lo / Carry
        b(1 + 4 * dims + i) = lo % Carry
        i += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    b(0) += o(0)
    var i = 0
    while (i < dims) {
      b(1 + i) += o(1 + i)
      if (o(1 + dims + i) < b(1 + dims + i)) b(1 + dims + i) = o(1 + dims + i)
      if (o(1 + 2 * dims + i) > b(1 + 2 * dims + i)) b(1 + 2 * dims + i) = o(1 + 2 * dims + i)
      val lo = b(1 + 4 * dims + i) + o(1 + 4 * dims + i) // both < 10¹⁸
      b(1 + 3 * dims + i) += o(1 + 3 * dims + i) + lo / Carry
      b(1 + 4 * dims + i) = lo % Carry
      i += 1
    }
    b
  }

  override def eval(b: Array[Long]): Any = {
    if (b(0) == 0L) return new GenericArrayData(Array.empty[Any])
    val n = BigInteger.valueOf(b(0))
    val rows: Array[Any] = Array.tabulate(dims) { i =>
      val sum = b(1 + i)
      val ssq = BigInteger.valueOf(b(1 + 3 * dims + i)).multiply(CarryBig)
        .add(BigInteger.valueOf(b(1 + 4 * dims + i)))
      // exact 128-bit variance numerator n·Σm² − (Σm)² ≥ 0 (Cauchy-
      // Schwarz over the integer micros); per-dim variance = varn / n²
      // micros². Runs once per (group, dim) at eval — never in the
      // per-row update path.
      val varn = n.multiply(ssq)
        .subtract(BigInteger.valueOf(sum).multiply(BigInteger.valueOf(sum)))
      val Array(vHi, vLo) = varn.divideAndRemainder(CarryBig)
      InternalRow(i.toLong, b(0), sum, b(1 + dims + i), b(1 + 2 * dims + i),
        b(1 + 3 * dims + i), b(1 + 4 * dims + i),
        vHi.longValueExact(), vLo.longValueExact())
    }
    new GenericArrayData(rows)
  }

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * b.length)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("dim", LongType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("sum_mu", LongType, nullable = false),
    StructField("min_mu", LongType, nullable = false),
    StructField("max_mu", LongType, nullable = false),
    StructField("ssq_hi", LongType, nullable = false),
    StructField("ssq_lo", LongType, nullable = false),
    StructField("varn_hi", LongType, nullable = false),
    StructField("varn_lo", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(n: Int): VecDimStatsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecDimStatsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): VecDimStatsAgg =
    copy(child = newChild)
  override def prettyName: String = "vec_dim_stats"
}
