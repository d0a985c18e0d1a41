package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two columns'
  * normalized values and range-partition + sort the data by that z-value
  * before writing.
  *
  * Why it matters at 100 TB: parquet readers prune row groups / files with
  * min-max statistics. A single-column sort gives perfect pruning on that
  * column and NONE on any other; z-ordering bounds every file's extent in
  * BOTH dimensions (a 4×4 tile instead of a 1×16 stripe), so selective
  * filters on either column skip most of the data. This is a pure layout
  * operator — queries don't change, the scan statistics do.
  */
object ZOrder {

  /** Interleave the low `bits` bits of two non-negative long columns:
    * a's bit i lands at position 2i, b's at 2i+1. Pure codegen'd
    * shift/or expression — no UDF.
    */
  def interleave(a: Column, b: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, "1..31 bits per dimension")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Linear scaling of a numeric column onto [0, 2^bits): the standard
    * z-value normalization (rank-exact normalization would need a global
    * sort; linear keeps locality and is computed from two scalars).
    */
  def scaleToGrid(c: Column, min: Double, max: Double, bits: Int): Column = {
    val cells = (1L << bits) - 1
    if (max <= min) lit(0L)
    else least(lit(cells), greatest(lit(0L),
      floor((c.cast("double") - lit(min)) / lit(max - min) * cells).cast("long")))
  }

  /** The z-value of two numeric columns given their global ranges. */
  def zValue(a: Column, aMin: Double, aMax: Double,
             b: Column, bMin: Double, bMax: Double, bits: Int = 16): Column =
    interleave(scaleToGrid(a, aMin, aMax, bits), scaleToGrid(b, bMin, bMax, bits), bits)

  /** How many files of a parquet layout a min-max-stats reader must scan
    * for the box predicate `a ∈ [aLo, aHi] AND b ∈ [bLo, bHi]` — i.e. the
    * files whose per-file [min, max] extent intersects the box in BOTH
    * dimensions. This is exactly the file-skipping decision Delta/Iceberg
    * make from file-level stats (and parquet readers per row group); it is
    * measured from the data itself (`input_file_name` + per-file min/max,
    * one two-column scan) so the count is engine-independent and
    * assertable. Returns (filesTotal, filesSurviving).
    */
  def filesIntersectingBox(back: DataFrame, a: String, aLo: Double, aHi: Double,
                           b: String, bLo: Double, bHi: Double): (Long, Long) = {
    val stats = back
      .groupBy(input_file_name().as("f"))
      .agg(min(col(a).cast("double")).as("a_min"), max(col(a).cast("double")).as("a_max"),
        min(col(b).cast("double")).as("b_min"), max(col(b).cast("double")).as("b_max"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("a_min") <= aHi && col("a_max") >= aLo &&
          col("b_min") <= bHi && col("b_max") >= bLo, 1L).otherwise(0L))
          .as("n_hit"))
      .head()
    // zero input files: the global sum aggregate is null — mirror
    // writeZOrdered's explicit empty-input handling instead of NPEing.
    if (stats.isNullAt(1)) (0L, 0L)
    else (stats.getLong(0), stats.getLong(1))
  }

  /** Write `df` as parquet laid out along the z-curve of (colA, colB):
    * one tiny agg job for the two ranges, then range-partition on the
    * z-value (distributed total order — no single-task sort) and sort
    * within partitions so row-group stats are tight too. `numFiles`
    * bounds output file count.
    */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    numFiles: Int, bits: Int = 16): Unit = {
    val r = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    if (r.isNullAt(0) || r.isNullAt(2)) {
      // empty input or an all-null layout column: no ranges to grid —
      // write as-is rather than NPE on the unboxed aggregate.
      df.write.mode("overwrite").parquet(path)
      return
    }
    val zv = zValue(col(colA), r.getDouble(0), r.getDouble(1),
      col(colB), r.getDouble(2), r.getDouble(3), bits)
    df.withColumn("__zv", zv)
      .repartitionByRange(numFiles, col("__zv"))
      .sortWithinPartitions("__zv")
      .drop("__zv")
      .write.mode("overwrite").parquet(path)
  }
}
