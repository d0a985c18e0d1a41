package graft.plans

import java.util.{PriorityQueue => JPriorityQueue}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-key top-K as a first-class operator: logical node → planner
  * strategy → physical execution with bounded heaps.
  *
  * The stock formulation — `row_number() OVER (PARTITION BY k ORDER BY v)
  * ... WHERE rn <= K` — fully sorts every shuffle partition and ships every
  * input row through the shuffle. This operator keeps a K-row heap per key
  * in TWO phases, like partial aggregation: a map-side pass caps each
  * (partition, key) at K rows BEFORE the exchange (shuffle volume drops
  * from |rows| to ≤ K·|keys|·|partitions|), then the post-shuffle pass
  * merges heaps per key. Memory is O(K · distinct keys per task); nothing
  * is globally sorted.
  */
case class TopKPerKeyPlan(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, partial: Boolean, child: SparkPlan)
    extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions ({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      // heap head = WORST retained row, so `better than head` decides eviction
      val better = RowOrdering.create(sortOrder, childOutput)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, JPriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.getOrElse(key, null) match {
          case null =>
            val h = new JPriorityQueue[InternalRow](kk + 1, better.reverse)
            heaps.put(key.copy(), h)
            h
          case h => h
        }
        if (heap.size < kk) heap.offer(row.copy())
        else if (better.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.offer(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Plans the logical node as partial → (shuffle via distribution) → final. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyPlan(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {

  /** Ensure the strategy is installed on this session (idempotent). Also
    * injectable at config time through `SparkSessionExtensions`.
    */
  def ensureRegistered(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerKeyStrategy
    }

  /** Top `k` rows per distinct `keyCols` combination, ranked by `orderBy`
    * (column name → ascending?). Ties must be broken by the ordering for
    * deterministic output.
    */
  def topK(df: DataFrame, keyCols: Seq[String], orderBy: Seq[(String, Boolean)],
           k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureRegistered(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      analyzed.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${analyzed.output.map(_.name)}"))
    val order = orderBy.map { case (c, asc) =>
      SortOrder(attr(c), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(spark, TopKPerKeyPlan(keyCols.map(attr), order, k, analyzed))
  }
}
