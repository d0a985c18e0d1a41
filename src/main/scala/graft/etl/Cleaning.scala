package graft.etl

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Regex cleaning + row validation + dense re-indexing.
  *
  * Re-expresses the reference's `validate_data` step
  * (/root/reference/dags/main.py:172-255) as pure `DataFrame => DataFrame`
  * transforms. Everything stays in one Catalyst plan: the regexes, the
  * validity predicate and the downstream consumer fuse into a single
  * WholeStageCodegen pass over the scan — no intermediate materialization.
  */
object Cleaning {

  /** Keep digits and dot (reference: square). */
  val KeepNumericDot = "[^0-9.]"

  /** Keep digits only (reference: population, communal_service_id, year). */
  val KeepDigits = "[^0-9]"

  /** Keep digits, dot, minus (reference: latitude/longitude). */
  val KeepSignedNumeric = "[^0-9.\\-]"

  /** `regexp_replace(trim(c), dropPattern, "")` — the reference's cleaning
    * idiom (main.py:178-183). */
  def cleanNumeric(c: Column, dropPattern: String): Column =
    regexp_replace(trim(c), dropPattern, "")

  /** Non-null, non-blank text (main.py:185-186). */
  def isNotEmpty(c: Column): Column = c.isNotNull && trim(c) =!= ""

  /** Unsigned decimal literal that survives a double cast (main.py:205-208). */
  def validDouble(c: Column): Column =
    c.rlike("^[0-9]+(\\.[0-9]+)?$") && c.cast(DoubleType).isNotNull

  /** Unsigned integer literal (main.py:209-216). */
  def validInt(c: Column): Column =
    c.rlike("^[0-9]+$") && c.cast(IntegerType).isNotNull

  /** Exactly four digits (main.py:201-204). */
  def validYear(c: Column): Column =
    c.rlike("^[0-9]{4}$") && c.cast(IntegerType).isNotNull

  /** Castable signed coordinate (main.py:197-200). */
  def validCoord(c: Column): Column = c.cast(DoubleType).isNotNull

  /** Sink-side date normalization (main.py:445-452): a bare 4-digit year
    * becomes "yyyy-01-01", then parses with `to_date`; anything already in
    * date form passes through the same parse. Non-parsable strings → null
    * (non-ANSI to_date), matching the reference's PySpark behavior.
    */
  def normalizeYearToDate(c: Column): Column =
    to_date(
      when(length(c) === 4, concat_ws("-", c, lit("01"), lit("01"))).otherwise(c),
      "yyyy-MM-dd")

  /** Faithful dense re-index (main.py:230-231): `row_number` over a GLOBAL
    * window. Correct but single-partition — small/medium data only. The
    * 100 TB path is [[reindexScalable]].
    */
  def reindex(df: DataFrame, order: Column, as: String): DataFrame =
    df.withColumn(as, row_number().over(Window.orderBy(order)).cast(LongType))

  /** Scale path for dense 1-based ids: total-order sort (range-partitioned
    * shuffle, stays distributed) + per-partition `zipWithIndex` offsets.
    * Two jobs (zipWithIndex counts partitions first) but never funnels the
    * data through one task the way a global window does.
    */
  def reindexScalable(df: DataFrame, order: Column, as: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(order)
    val outSchema = StructType(sorted.schema.fields :+ StructField(as, LongType, nullable = false))
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, outSchema)
  }
}
