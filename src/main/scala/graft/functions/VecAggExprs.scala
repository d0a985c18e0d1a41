package graft.functions

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
    * for each dim, (n, Σ⌊x·10⁶⌋, min⌊x·10⁶⌋, max⌊x·10⁶⌋). Micros flooring
    * makes every cell an exact, order-independent BIGINT — float→double
    * widening is exact, ·10⁶ is one correctly-rounded double op, floor is
    * exact — so the aggregate is replayable bit-for-bit by any engine and
    * safe under Spark's nondeterministic partial-merge order (a raw float
    * sum would not be). Buffer: 1 + 3·dims longs (count, sums, mins,
    * maxes). Rows whose vector length ≠ `dims` fail loudly — a silent
    * skip would corrupt the profile.
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

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"vec_dim_stats expects array<float>, got ${t.simpleString}")
  }

  // layout: [0]=count, [1..dims]=sum_mu, [1+dims..]=min_mu, [1+2*dims..]=max_mu
  override def createAggregationBuffer(): Array[Long] = {
    val b = new Array[Long](1 + 3 * dims)
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
        b(1 + i) += mu
        if (mu < b(1 + dims + i)) b(1 + dims + i) = mu
        if (mu > b(1 + 2 * dims + i)) b(1 + 2 * dims + i) = mu
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
      i += 1
    }
    b
  }

  override def eval(b: Array[Long]): Any = {
    if (b(0) == 0L) return new GenericArrayData(Array.empty[Any])
    val rows: Array[Any] = Array.tabulate(dims) { i =>
      InternalRow(i.toLong, b(0), b(1 + i), b(1 + dims + i), b(1 + 2 * dims + i))
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
    StructField("max_mu", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = true

  override def withNewMutableAggBufferOffset(n: Int): VecDimStatsAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecDimStatsAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): VecDimStatsAgg =
    copy(child = newChild)
  override def prettyName: String = "vec_dim_stats"
}
