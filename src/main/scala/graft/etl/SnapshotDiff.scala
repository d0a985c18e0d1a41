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

  /** Apply a delta to a snapshot — the MERGE INTO shape (upserts win
    * over existing rows, deletes drop them, untouched rows carry over):
    * the incremental-compaction step that folds a re-crawl's diff back
    * into the canonical snapshot WITHOUT re-shipping unchanged payloads
    * through a wide join. One LEFT ANTI equi-join of the snapshot
    * against the touched-id set (broadcast when the delta is small —
    * the common case) plus a union with the upserts. (A partitioned
    * lake would additionally rewrite only the partitions the touched
    * ids land in — compose with the partitioned sink's layout.)
    */
  def applyDelta(snapshot: DataFrame, upserts: DataFrame,
                 deleteIds: DataFrame, id: Column): DataFrame = {
    val touched = upserts.select(id.as("__tid"))
      .unionByName(deleteIds.select(id.as("__tid")))
      .distinct()
    snapshot.join(touched, id === col("__tid"), "left_anti")
      .unionByName(upserts)
  }

  /** Collapse a CDC delta to its LAST WRITER per key: change streams
    * deliver versioned upserts out of order, and only the max-version
    * row per id may reach [[applyDelta]]. Runs through TopKPerKey k=1
    * bounded heaps (a hot id with a million versions ships one row per
    * map task — never a per-id sort or window). Versions must be unique
    * per id (a CDC log's LSN/sequence contract); ties would be
    * nondeterministic and are the upstream's bug to fix.
    */
  def collapseCdc(delta: DataFrame, idCol: String, verCol: String): DataFrame =
    graft.plans.TopKPerKey.topK(delta, Seq(idCol), Seq((verCol, false)), 1)

  /** Apply a versioned CDC delta WITH tombstones to a snapshot: collapse
    * to the last writer per id ([[collapseCdc]]), then route by the op
    * column — a max-version tombstone drops the id, a max-version upsert
    * replaces the row, ids the delta never touched carry over unmoved.
    * Version order resolves conflicting intents BEFORE the merge (an
    * early delete overwritten by a later upsert keeps the row; a delete
    * after upserts drops it), which is exactly what makes tombstones
    * safe to compact. The collapsed delta is persisted once — it feeds
    * both the upsert and the delete side — and it is diff-sized, never
    * snapshot-sized, so the [[applyDelta]] anti-join broadcast stays the
    * common case.
    *
    * `delta` must carry the snapshot's columns plus `verCol` and
    * `opCol` (`opCol == deleteOp` marks a tombstone; its payload
    * columns are ignored).
    */
  def applyCdc(snapshot: DataFrame, delta: DataFrame, idCol: String,
               verCol: String, opCol: String,
               deleteOp: String = "d"): DataFrame = {
    val last = graft.CachePool.persist(collapseCdc(delta, idCol, verCol))
    val upserts = last.filter(col(opCol) =!= deleteOp).drop(verCol, opCol)
    val deletes = last.filter(col(opCol) === deleteOp).select(col(idCol))
    applyDelta(snapshot, upserts, deletes, col(idCol))
  }

  /** Build the SCD TYPE-2 validity history from versioned change events:
    * per key ordered by effective time, each version's row carries
    * `valid_from` = its effective timestamp, `valid_to` = the NEXT
    * version's effective timestamp (null while current), and an
    * `is_current` flag — the effective-dated dimension a point-in-time
    * join (`q_asof_join`'s consumer side) reads.
    *
    * Shape: one `lead` window per key ordered by the event time — one
    * shuffle on the key, per-key state bounded by that key's version
    * count, never a global window. Ties on (ts) break by `verCol` so
    * the history is total-ordered and deterministic.
    */
  def scd2History(events: DataFrame, idCol: String, tsCol: String,
                  verCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(idCol).orderBy(col(tsCol), col(verCol))
    events
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Per-source DISTRIBUTION DRIFT between snapshots — did a re-crawl
    * shift what a source looks like, not just which rows it has? Both
    * snapshots histogram over an integer `bucket` feature (token/char
    * deciles — any derived integer); per source the total-variation
    * distance between the two bucket distributions is emitted as an
    * exact integer FRACTION: tv_num = Σ_buckets |n_new·t_old −
    * n_old·t_new|, tv_den = 2·t_old·t_new, TV = tv_num/tv_den ∈ [0, 1]
    * driver-derivable, `drift` = (TV > 5%) via the integer
    * cross-multiply tv_num·20 > tv_den. No float anywhere, so any
    * engine replays the row bit-for-bit. (The BIGINT products cover
    * ~10⁹ rows per source; beyond that the same shape runs with
    * DECIMAL(38,0) sums, as with the correlation moments.)
    *
    * Shape: two map-side-combinable grouped counts, one full-outer
    * equi-join on (source, bucket) — cells per source bounded by the
    * bucket count — then a per-source fold over the bounded cells with
    * the 1-row-per-source totals broadcast back on.
    */
  def driftTable(oldSnap: DataFrame, newSnap: DataFrame,
                 source: Column, bucket: Column): DataFrame = {
    def hist(df: DataFrame, as: String) =
      df.select(source.as("source"), bucket.cast("long").as("bucket"))
        .groupBy("source", "bucket").agg(count(lit(1)).as(as))
    val cells = hist(oldSnap, "n_old")
      .join(hist(newSnap, "n_new"), Seq("source", "bucket"), "full_outer")
      .select(col("source"), col("bucket"),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        coalesce(col("n_new"), lit(0L)).as("n_new"))
    val totals = cells.groupBy("source")
      .agg(sum("n_old").as("t_old"), sum("n_new").as("t_new"))
    cells.join(broadcast(totals), "source")
      .groupBy("source")
      .agg(first(col("t_old")).as("t_old"), first(col("t_new")).as("t_new"),
        sum(abs(col("n_new") * col("t_old") - col("n_old") * col("t_new")))
          .as("tv_num"))
      .select(col("source"), col("t_old"), col("t_new"), col("tv_num"),
        (col("t_old") * col("t_new") * 2).as("tv_den"),
        (col("tv_num") * 20 > col("t_old") * col("t_new") * 2).as("drift"))
      .orderBy("source")
  }
}
