package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** First-fit-decreasing bin assignment over one bounded group — the
  * classic better-packing heuristic beside next-fit greedy (FFD ≤
  * 11/9·OPT + 6/9, Johnson 1973; next-fit is only 2·OPT): items are
  * taken largest first and each goes into the LOWEST-numbered open bin
  * with room, opening a new bin when none fits. An item larger than the
  * budget opens its own bin (and nothing ever joins it — its fill
  * already exceeds the budget), matching the greedy packer's
  * oversized-alone rule.
  *
  * Input: the group's sizes IN DOC-ID ORDER (array<int>, bounded by the
  * packer's groupSize); output: array<long> — for each input POSITION,
  * its bin index, bins numbered in open order. Deterministic: FFD
  * processing order is (size desc, position asc); both the order and the
  * first-fit scan are pure functions of the input, so any engine can
  * replay the assignment exactly (the DuckDB oracle carries the open-bin
  * fill list through a recursive CTE).
  *
  * The O(n²) first-fit scan is bounded by groupSize (the packer's shard
  * contract — the group array already fits in one row); production FFD
  * would use a best-fit tree, pointless at n ≤ a few hundred.
  */
case class FfdBins(child: Expression, budget: Long) extends UnaryExpression {

  require(budget > 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ffd_bins expects array<int>, got ${t.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sizes = new Array[Int](n)
    var i = 0
    while (i < n) {
      sizes(i) = if (arr.isNullAt(i)) 0 else arr.getInt(i)
      i += 1
    }
    // processing order: size desc, position asc (stable)
    val order = Array.range(0, n).sortBy(p => (-sizes(p), p))
    val fills = new Array[Long](n) // at most n bins
    var nBins = 0
    val assign = new Array[Long](n)
    var oi = 0
    while (oi < n) {
      val p = order(oi)
      val sz = sizes(p).toLong
      var b = 0
      while (b < nBins && fills(b) + sz > budget) b += 1
      if (b == nBins) { fills(nBins) = sz; nBins += 1 }
      else fills(b) += sz
      assign(p) = b.toLong
      oi += 1
    }
    new GenericArrayData(assign)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = classOf[FfdBins].getName
    val ref = ctx.addReferenceObj("ffd", this, cls)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): FfdBins =
    copy(child = newChild)
}

object PackExprs {

  /** Per-position FFD bin index of an array<int> of sizes (see
    * [[FfdBins]]).
    */
  def ffdBins(sizes: Column, budget: Int): Column =
    ColumnBridge.column(FfdBins(ColumnBridge.expression(sizes), budget.toLong))
}
