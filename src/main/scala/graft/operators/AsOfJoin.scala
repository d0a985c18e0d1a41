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
    // Output columns are left's ++ right's payload ++ s"${tsCol}_right":
    // a shared name would emit an ambiguous duplicate column downstream.
    val clash = rightPayload.toSet.intersect(left.columns.toSet)
    require(clash.isEmpty,
      s"right payload columns collide with left columns: ${clash.mkString(", ")} — rename before joining")
    require(!left.columns.contains(s"${tsCol}_right") && !rightPayload.contains(s"${tsCol}_right"),
      s"'${tsCol}_right' is reserved for the matched right timestamp")
    val reserved = Seq("__side", "__r_row", "__m_row", "__ts")
    val reservedClash = (left.columns ++ right.columns).filter(reserved.contains)
    require(reservedClash.isEmpty,
      s"input columns use reserved internal names: ${reservedClash.mkString(", ")}")

    // The whole right row travels as ONE struct carried by ONE
    // last(ignoreNulls) — per-payload-column windows would stitch a hybrid
    // "row" from different right rows whenever the latest right row has a
    // null in some payload column (and cost one window pass per column).
    val rowStructCols = struct(
      col(tsCol).as("__ts") +: rightPayload.map(c => col(c).as(c)): _*)

    val lTagged = left
      .withColumn("__side", lit(1)) // left sorts after a same-ts right row
      .withColumn("__r_row",
        lit(null).cast(right.select(rowStructCols).schema.head.dataType))
    val rTagged = right
      .withColumn("__side", lit(0))
      .withColumn("__r_row", rowStructCols)
      .select(Seq(col(key), col(tsCol), col("__side"), col("__r_row")) ++
        left.columns.filterNot(Set(key, tsCol))
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // right rows at the same key+ts sort before left rows (side 0 < 1),
    // so a left row can match a right row with an equal timestamp.
    val w = Window.partitionBy(key).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val merged = lTagged.unionByName(rTagged.select(lTagged.columns.map(col): _*))
      .withColumn("__m_row", last(col("__r_row"), ignoreNulls = true).over(w))

    val matchTs = col("__m_row").getField("__ts")
    val withinTolerance = toleranceSec match {
      case Some(t) => col("__m_row").isNotNull &&
        graft.analytics.Relational.epochMicros(col(tsCol)) -
          graft.analytics.Relational.epochMicros(matchTs) <= t * 1000000L
      case None => col("__m_row").isNotNull
    }

    merged
      .filter(col("__side") === 1)
      .select(Seq(col(key), col(tsCol)) ++
        left.columns.filterNot(Set(key, tsCol)).map(col) ++
        rightPayload.map(c =>
          when(withinTolerance, col("__m_row").getField(c)).as(c)) :+
        when(withinTolerance, matchTs).as(s"${tsCol}_right"): _*)
  }
}
