package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact deduplication: normalize → hash-group → keep one representative.
  *
  * Scale: one shuffle on the normalized text (or its xxhash64 for wide
  * texts), map-side partial aggregation; no driver involvement.
  */
object ExactDedup {

  /** Canonical text form: lowercase, trim, collapse internal whitespace. */
  def normalize(text: Column): Column =
    regexp_replace(lower(trim(text)), "\\s+", " ")

  /** One row per duplicate group: the kept (minimum) id + group size.
    * Grouping key is the normalized text itself so the result is exact;
    * at 100 TB group on xxhash64(normalize(text)) first and only compare
    * full text within colliding buckets (see [[groupsByHash]]).
    */
  def groups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(normalize(text).as("norm_text"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** Scale variant: shuffle 8-byte hashes instead of full documents. */
  def groupsByHash(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(xxhash64(normalize(text)).as("norm_hash"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))
      .select("keep_id", "n_copies")

  /** The deduplicated table itself: keep the min-id row per group.
    * One window over the normalized text — a single shuffle and a single
    * evaluation of the input plan. (The groups()-then-semi-join shape is a
    * diamond: both join inputs re-derive the frame, so an expensive
    * upstream — e.g. DocPipeline's regex features — would run twice.)
    * Per-key state is one row; skew is bounded by the duplicate count of
    * the hottest text.
    */
  def dedup(df: DataFrame, text: Column, id: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(normalize(text)).orderBy(id)
    df.withColumn("__dd_rn", row_number().over(w))
      .filter(col("__dd_rn") === 1)
      .drop("__dd_rn")
  }
}
