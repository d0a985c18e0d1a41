package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the LATEST right row with
  * `right.ts <= left.ts` (optionally within `toleranceSec`), per key.
  * Spark has no native operator for this; the naive formulation
  * (`left JOIN right ON key AND r.ts <= l.ts`, then keep the max) is a
  * range join that explodes to O(|left| × |right per key|).
  *
  * This is the union-merge formulation instead: tag both sides, union on
  * (key, ts), and carry the last right payload forward with a running
  * `last(_, ignoreNulls)` window. Cost: ONE shuffle on the key and a
  * per-key sort — linear in |left| + |right|, no pair explosion, and the
  * window is per-key so it parallelizes across the cluster (no global
  * single-partition window).
  */
object AsOfJoin {

  /** `left` and `right` must share the key column `key` and both carry a
    * timestamp column `tsCol`. Right's payload columns (everything except
    * key/ts) come back null when no right row is at-or-before the left
    * row (or the match is older than `toleranceSec`, if set).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, tsCol: String,
           toleranceSec: Option[Long] = None): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != tsCol).toSeq
    require(rightPayload.nonEmpty, "right side needs at least one payload column")

    val lTagged = left
      .withColumn("__side", lit(1)) // left sorts after a same-ts right row
      .withColumn("__rts", lit(null).cast("timestamp"))
      .select(Seq(col(key), col(tsCol), col("__side"), col("__rts")) ++
        left.columns.filterNot(Set(key, tsCol)).map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val rTagged = right
      .withColumn("__side", lit(0))
      .withColumn("__rts", col(tsCol))
      .select(Seq(col(key), col(tsCol), col("__side"), col("__rts")) ++
        left.columns.filterNot(Set(key, tsCol))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)

    // right rows at the same key+ts sort before left rows (side 0 < 1),
    // so a left row can match a right row with an equal timestamp.
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = lTagged.unionByName(rTagged)
      .withColumn("__m_ts", last(col("__rts"), ignoreNulls = true).over(w))
    val carried = rightPayload.foldLeft(merged) { (df, c) =>
      df.withColumn(s"__m_$c", last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }

    val withinTolerance = toleranceSec match {
      case Some(t) => col("__m_ts").isNotNull &&
        unix_micros(col(tsCol)) - unix_micros(col("__m_ts")) <= t * 1000000L
      case None => col("__m_ts").isNotNull
    }

    val out = carried
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(tsCol)) ++
        left.columns.filterNot(Set(key, tsCol)).map(col) ++
        rightPayload.map(c =>
          when(withinTolerance, col(s"__m_$c")).as(c)) :+
        when(withinTolerance, col("__m_ts")).as(s"${tsCol}_right"): _*)
    out
  }
}
