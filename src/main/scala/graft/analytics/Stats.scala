package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Grouped/ordered analytics re-expressing the reference's analysis tasks
  * (/root/reference/dags/main.py tasks 4-7 and 11) as generic operators.
  *
  * All operators are plain Catalyst plans: partial (map-side) aggregation,
  * AQE partition coalescing and `TakeOrderedAndProject` for ordered top-K
  * come for free — no driver-side collection anywhere.
  */
object Stats {

  /** Average + exact median of a numeric column (main.py:289-309).
    * The reference uses `percentile_approx`; at 100 TB that is the right
    * call — both are exposed. Exact percentile is used for oracle parity.
    */
  def centralStats(df: DataFrame, value: Column): DataFrame =
    df.select(value.as("v"))
      .agg(
        avg(col("v")).as("avg_v"),
        expr("percentile(v, 0.5D)").as("median_v")
      )

  /** The scale form (and the reference's actual call): approximate median
    * via a mergeable quantile sketch — single pass, bounded memory per
    * partition, no sort. `accuracy` trades memory for error (1/accuracy).
    */
  def centralStatsApprox(df: DataFrame, value: Column, accuracy: Int = 10000): DataFrame =
    df.select(value.as("v"))
      .agg(
        avg(col("v")).as("avg_v"),
        percentile_approx(col("v"), lit(0.5), lit(accuracy)).as("median_v")
      )

  /** Top-K groups by row count, deterministic tie-break on the key
    * (main.py:313-339). Plans as partial-agg → shuffle → TakeOrdered. */
  def topGroupsByCount(df: DataFrame, key: Column, k: Int, as: String = "n_objects"): DataFrame =
    df.groupBy(key)
      .agg(count(lit(1)).as(as))
      .orderBy(col(as).desc, key)
      .limit(k)

  /** Per-group min/max of a value column, ordered by group (main.py:343-357). */
  def minMaxByGroup(df: DataFrame, key: Column, value: Column): DataFrame =
    df.groupBy(key)
      .agg(max(value).as("max_v"), min(value).as("min_v"))
      .orderBy(key)

  /** Bucketed histogram: floor(v / width) * width → count (main.py:361-377). */
  def bucketHistogram(df: DataFrame, value: Column, width: Int, as: String = "bucket"): DataFrame =
    df.withColumn(as, (floor(value / width) * width).cast(LongType))
      .groupBy(col(as))
      .agg(count(lit(1)).as("n"))
      .orderBy(col(as))

  /** Exact per-group quantiles. Interpolated exact percentile is only
    * hash-stable across engines for integral values at power-of-two
    * fractions (the interpolation `a + (b-a)·f` is then exact in IEEE
    * regardless of op order); for arbitrary doubles use
    * [[centralStatsApprox]]-style sketches or rank-based outputs.
    */
  def groupQuantiles(df: DataFrame, key: Column, value: Column,
                     qs: Seq[Double]): DataFrame = {
    val aggs = qs.zipWithIndex.map { case (q, i) =>
      expr(s"percentile(__gq_v, ${q}D)").as(s"q_$i")
    }
    df.select(key.as("k"), value.as("__gq_v"))
      .groupBy("k")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("k")
  }

  /** Filter + ORDER BY … DESC LIMIT K with deterministic tie-breaks
    * (main.py:481-502). Catalyst plans this as TakeOrderedAndProject —
    * each partition keeps a K-row heap, the driver merges K*P rows, so it
    * scales to any input size without a global sort.
    */
  def topKFilter(df: DataFrame, pred: Column, sortKey: Column, tieBreak: Seq[Column], k: Int): DataFrame =
    df.filter(pred).orderBy(sortKey.desc +: tieBreak: _*).limit(k)
}
