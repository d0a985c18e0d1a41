package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset-version diffing — what changed between two corpus snapshots.
  * Every periodically-refreshed pipeline needs the answer (how much of
  * the last crawl survived? what did the re-crawl touch?) and the
  * scalable shape is one id-keyed FULL OUTER equi-join over content
  * hashes: both sides shuffle-partition on the id ONCE, rows classify
  * with null/hash tests, and only constant-size class counts leave the
  * join — the 8-byte (id, hash) projection is all that moves, never the
  * payloads.
  */
object SnapshotDiff {

  /** Per-row classification of `newSnap` against `oldSnap`:
    * (id, change ∈ added | removed | changed | unchanged). `contentHash`
    * should be a 64-bit content fingerprint (e.g. `xxhash64(text)` —
    * collisions misclassify a changed row as unchanged with probability
    * ~2⁻⁶⁴ per row; chain more columns into the hash for payloads wider
    * than one column).
    */
  def classify(oldSnap: DataFrame, newSnap: DataFrame,
               id: Column, contentHash: Column): DataFrame = {
    val o = oldSnap.select(id.as("id"), contentHash.as("old_h"))
    val n = newSnap.select(id.as("id"), contentHash.as("new_h"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("old_h").isNull, "added")
          .when(col("new_h").isNull, "removed")
          .when(col("old_h") =!= col("new_h"), "changed")
          .otherwise("unchanged").as("change"))
  }

  /** The diff summary: one exact count per change class, ordered. */
  def diffCounts(oldSnap: DataFrame, newSnap: DataFrame,
                 id: Column, contentHash: Column): DataFrame =
    classify(oldSnap, newSnap, id, contentHash)
      .groupBy("change")
      .agg(count(lit(1)).as("n"))
      .orderBy("change")
}
