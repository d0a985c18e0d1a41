package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join by bucket blocking.
  *
  * Spark plans `p.x BETWEEN i.lo AND i.hi` as a broadcast-nested-loop (or
  * cartesian) join — O(|points| × |intervals|). Blocking fixes the shape:
  * each interval registers in every `width`-sized bucket it overlaps, each
  * point in exactly the one bucket containing it, and the join becomes a
  * bucket equi-join + exact refine. Because a point has exactly ONE
  * bucket, each matching (point, interval) pair meets exactly once — no
  * dedup pass.
  *
  * Cost: |intervals| × (span/width + 1) replicated rows, one shuffle on
  * the 8-byte bucket key (AQE-skewable, saltable). Pick `width` near the
  * median interval span so replication stays ~2×.
  */
object RangeJoin {

  private def bucketOf(x: Column, width: Double): Column =
    floor(x / width).cast("long")

  /** Rows (point columns ++ interval columns) for every point falling in
    * [lo, hi]. `points`/`intervals` must not share column names.
    */
  def pointInInterval(points: DataFrame, x: String,
                      intervals: DataFrame, lo: String, hi: String,
                      width: Double): DataFrame = {
    require(width > 0)
    val p = points.withColumn("__bkt", bucketOf(col(x), width))
    val i = intervals.withColumn("__bkt",
      explode(sequence(bucketOf(col(lo), width), bucketOf(col(hi), width))))
    p.join(i, Seq("__bkt"))
      .filter(col(x) >= col(lo) && col(x) <= col(hi))
      .drop("__bkt")
  }
}
