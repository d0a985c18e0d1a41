package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** INCREMENTAL VIEW MAINTENANCE of a grouped count/sum view — the
  * signed-delta algebra that keeps a 100 TB rollup current without
  * rescanning the base: inserts aggregate with weight +1, deletes with
  * −1, the maintained view folds the delta in with ONE key-keyed outer
  * join, and groups whose row count reaches zero vanish. Cost scales
  * with |delta| + |view|, never |base| — the whole point.
  *
  * Count/sum views are self-maintainable under inserts AND deletes (no
  * base access at all); min/max are not (a deleted extremum needs a
  * rescan of its group) — callers wanting min/max maintain them as
  * monotone approximations or recompute affected groups.
  */
object Ivm {

  /** Aggregate a slice of base rows to the view grain with a sign. */
  def deltaAgg(rows: DataFrame, keys: Seq[String], value: Column,
               sign: Int): DataFrame =
    rows.groupBy(keys.map(col): _*)
      .agg((count(lit(1)) * sign).as("d_n"),
        (sum(value) * sign).as("d_sum"))

  /** Fold signed insert/delete deltas into a (keys…, n_rows, sum_v)
    * view. Returns the maintained view, zero-count groups dropped. */
  def maintain(view: DataFrame, inserts: DataFrame, deletes: DataFrame,
               keys: Seq[String], value: Column): DataFrame = {
    val delta = deltaAgg(inserts, keys, value, 1)
      .unionByName(deltaAgg(deletes, keys, value, -1))
      .groupBy(keys.map(col): _*)
      .agg(sum("d_n").as("d_n"), sum("d_sum").as("d_sum"))
    view.join(delta, keys, "full")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_n"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_v"), lit(0L)) + coalesce(col("d_sum"), lit(0L)))
          .as("sum_v")): _*)
      .filter(col("n_rows") > 0)
  }
}
