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
}
