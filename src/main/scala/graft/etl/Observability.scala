package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Pipeline observability via `Dataset.observe`: data-quality counters
  * computed ON the rows as they flow through the existing job — no second
  * pass, no extra action, negligible overhead (an accumulator per metric).
  * At 100 TB a separate "count the nulls" job doubles the scan; observed
  * metrics are free.
  */
object Observability {

  /** Attach row/null/violation counters to any stage. Read the metrics
    * from the returned Observation after the FIRST action on the frame.
    */
  def observed(df: DataFrame, name: String,
               nullChecked: Seq[String] = Nil,
               violations: Map[String, Column] = Map.empty): (DataFrame, Observation) = {
    val obs = Observation(name)
    val nullMetrics = nullChecked.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val violationMetrics = violations.toSeq.map { case (metricName, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(metricName)
    }
    val metrics = count(lit(1)).as("n_rows") +: (nullMetrics ++ violationMetrics)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Column PROFILE — the data-quality summary a lake catalog publishes
    * per table: one row per column with row/null/exact-distinct counts.
    * ONE wide aggregate computes every column's counters in a single
    * pass (count + conditional sums partial-aggregate map-side;
    * count(DISTINCT col) expands once per column but stays one job), and
    * the per-column rows are unpivoted from that single result — the
    * scan happens once however many columns are profiled.
    */
  def profile(df: DataFrame, columns: Seq[String]): DataFrame = {
    require(columns.nonEmpty)
    val aggs = columns.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nulls_$c"),
        countDistinct(col(c)).as(s"__ndv_$c"))
    }
    val wide = df.agg(count(lit(1)).as("__n"), aggs: _*)
    // sum over zero rows is NULL, not 0 — an empty table must still
    // profile as all-zero counters
    val pairs = columns.map(c =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        coalesce(col(s"__nulls_$c"), lit(0L)).as("n_nulls"),
        col(s"__ndv_$c").as("n_distinct")))
    wide.select(explode(array(pairs: _*)).as("p"))
      .select("p.col_name", "p.n_rows", "p.n_nulls", "p.n_distinct")
      .orderBy("col_name")
  }
}
