package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** k-anonymity / l-diversity privacy audit over a generalization ladder —
  * the release-gate a pipeline runs before publishing a table keyed by
  * quasi-identifiers (Sweeney 2002; Machanavajjhala et al. 2007).
  *
  * A record is re-identifiable when its quasi-identifier (QI) equivalence
  * class holds fewer than k records; the standard fix is GLOBAL RECODING —
  * coarsen the QIs level by level (bucket widening, hierarchy climb, column
  * drop) until the residual risk is acceptable. This operator audits every
  * level of the ladder in one pass and marks the first level that clears
  * the risk budget.
  *
  * Scale design: each level is one hash groupBy over its QI tuple
  * (partial-agg map-side combine; class count ≪ row count), followed by a
  * one-row reduction per level — the unioned audit frame holds #levels
  * rows, so the `chosen` window runs over #levels rows, never the corpus.
  * l-diversity's count_distinct shuffles (class, sensitive) pairs, bounded
  * by class-count × l. Nothing collects.
  */
object Privacy {

  /** Audit one ladder: for each (level, QI expressions), report class and
    * risk counts, the minimum l-diversity of the sensitive column, residual
    * risk in ppm (integer floor division — engine-portable), and whether
    * this is the FIRST level whose risk clears `maxRiskPpm`.
    */
  def kAnonymityLadder(df: DataFrame, levels: Seq[(Int, Seq[Column])],
                       sensitive: Column, k: Int, maxRiskPpm: Long): DataFrame = {
    require(levels.nonEmpty && k >= 2)
    val audits = levels.map { case (lvl, qis) =>
      df.groupBy(qis: _*)
        .agg(count(lit(1)).as("n"), count_distinct(sensitive).as("l"))
        .agg(
          lit(lvl).as("level"),
          sum("n").as("n_rows"),
          count(lit(1)).as("n_classes"),
          sum(when(col("n") < k, 1L).otherwise(0L)).as("n_risky_classes"),
          sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_risky_rows"),
          min("l").as("min_l"))
    }
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    audits.reduce(_.unionByName(_))
      .withColumn("risk_ppm", expr("n_risky_rows * 1000000 div n_rows"))
      .withColumn("chosen",
        col("level") === min(when(col("risk_ppm") <= maxRiskPpm, col("level"))).over(w))
      .withColumn("chosen", coalesce(col("chosen"), lit(false)))
      .orderBy("level")
  }
}
