package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Incremental (cross-snapshot) exact dedup via a Bloom filter — the shape
  * a continuously-ingesting corpus needs: dedup a fresh crawl batch against
  * an existing 100 TB snapshot WITHOUT joining the batch to the snapshot.
  *
  * Build: the snapshot's normalized-text hashes fold into ONE mergeable
  * Bloom sketch (Catalyst's own `BloomFilterAggregate`, the aggregate
  * behind runtime bloom-filter joins — map-side partial filters OR-merge,
  * one pass, bounded bits). The filter is a bounded index artifact (~1.2
  * bytes per item at 3% fpp), built once per snapshot and reused across
  * every subsequent batch — the same fit-once-search-many contract as the
  * ANN quantizers.
  *
  * Probe: each batch row tests its hash against the filter with
  * `BloomFilterMightContain` — a pure map, no shuffle, no state, so the
  * SAME predicate runs batch or streaming unchanged. Bloom-NEGATIVES are
  * definitely new (no false negatives, by construction) and pass straight
  * through map-side — the overwhelming majority of a genuinely fresh
  * crawl. Only bloom-POSITIVES (true duplicates + the fpp sliver) need
  * exact confirmation: the snapshot scans ONCE against the broadcast
  * positive set (broadcast hash join — the snapshot never shuffles), and
  * unconfirmed positives rejoin the survivors.
  */
object BloomDedup {

  /** Canonical key: 64-bit hash of the normalized text. */
  def normHash(text: Column): Column = xxhash64(ExactDedup.normalize(text))

  /** The snapshot's serialized Bloom filter over `normHash(text)` —
    * distributed build via `BloomFilterAggregate`, only the (bounded,
    * `optimalNumOfBits(expectedItems, fpp)`-bit) sketch reaches the
    * driver.
    */
  private def bloomAggColumn(text: Column, expectedItems: Long, fpp: Double): Column = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      expression(normHash(text)),
      Literal(expectedItems), Literal(numBits))
    column(agg.toAggregateExpression())
  }

  /** An empty filter (no bits set): the right semantics for an empty
    * snapshot — nothing matches.
    */
  private def emptyFilter(fpp: Double): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    BloomFilter.create(1L, fpp).writeTo(bos)
    bos.toByteArray
  }

  def buildFilter(snapshot: DataFrame, text: Column,
                  expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    val bytes = snapshot
      .select(bloomAggColumn(text, expectedItems, fpp).as("bf"))
      .head().getAs[Array[Byte]](0)
    if (bytes != null) bytes else emptyFilter(fpp)
  }

  /** One snapshot scan for BOTH the filter and its row count — the
    * summary query needs n_snapshot anyway, and a 100 TB snapshot should
    * not be re-scanned for a count the bloom-build job already saw.
    */
  def buildFilterWithCount(snapshot: DataFrame, text: Column,
                           expectedItems: Long, fpp: Double = 0.03): (Array[Byte], Long) = {
    val row = snapshot
      .select(bloomAggColumn(text, expectedItems, fpp).as("bf"),
        count(lit(1)).as("n"))
      .head()
    val bytes = row.getAs[Array[Byte]](0)
    (if (bytes != null) bytes else emptyFilter(fpp), row.getLong(1))
  }

  /** `true` iff the serialized filter might contain the row's key — the
    * map-side membership probe (codegen'd, broadcast with the task
    * binary).
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    column(BloomFilterMightContain(Literal(filterBytes, BinaryType), expression(key)))

  /** The batch rows that survive dedup against the snapshot: bloom
    * negatives pass map-side; bloom positives are exact-confirmed with one
    * broadcast probe of the snapshot (no snapshot shuffle). Returns the
    * batch frame filtered to survivors (all original columns).
    */
  def newDocs(snapshot: DataFrame, batch: DataFrame, id: Column, text: Column,
              expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val bf = buildFilter(snapshot, text, expectedItems, fpp)
    // the serialized filter is a BIG literal (≈0.9 bytes/item) — reference
    // it from exactly ONE expression and let downstream branches read the
    // boolean column, or every optimizer pass re-hashes megabytes of
    // literal per plan copy.
    val keyed = graft.CachePool.persist(
      batch.withColumn("__bd_h", normHash(text))
        .withColumn("__bd_hit", mightContain(bf, col("__bd_h"))))
    val negatives = keyed.filter(!col("__bd_hit"))
    val positives = keyed.filter(col("__bd_hit"))
    val confirmed = snapshot.select(normHash(text).as("__bd_h"))
      .join(broadcast(positives.select("__bd_h").distinct()), "__bd_h")
      .distinct()
    negatives.unionByName(positives.join(confirmed, Seq("__bd_h"), "left_anti"))
      .drop("__bd_h", "__bd_hit")
  }

  /** Driver-visible summary of one incremental dedup round, graded like
    * the recall gates: `n_snapshot` / `n_batch` / `n_true_dup` / `n_pass`
    * are exact integers any engine can replay (the no-false-negative
    * guarantee is what MAKES `n_pass` exact even though it is computed
    * through the bloom path), and `fp_ok` pins the false-positive count
    * within 4× the configured fpp (+4 absolute slack) — deterministic,
    * because the filter's bits are a pure function of the snapshot.
    * Output: one row (n_snapshot, n_batch, n_true_dup, n_pass, fp_ok).
    */
  def incrementalStats(snapshot: DataFrame, batch: DataFrame, id: Column, text: Column,
                       expectedItems: Long, fpp: Double = 0.03): DataFrame = {
    val (bf, nSnapshot) = buildFilterWithCount(snapshot, text, expectedItems, fpp)
    val keyed = graft.CachePool.persist(
      batch.select(id.as("doc_id"), normHash(text).as("__bd_h"))
        .withColumn("__bd_hit", mightContain(bf, col("__bd_h"))))
    val positives = keyed.filter(col("__bd_hit"))
    val confirmed = snapshot.select(normHash(text).as("__bd_h"))
      .join(broadcast(positives.select("__bd_h").distinct()), "__bd_h")
      .distinct()
    val batchCounts = keyed.agg(
      count(lit(1)).as("n_batch"),
      coalesce(sum(when(col("__bd_hit"), 1L).otherwise(0L)), lit(0L)).as("n_bloom_hit"))
    val dupCounts = positives.join(confirmed, "__bd_h")
      .agg(count(lit(1)).as("n_true_dup"))
    val snapCount = batchCounts.sparkSession.range(1)
      .select(lit(nSnapshot).as("n_snapshot"))
    batchCounts.crossJoin(dupCounts).crossJoin(snapCount)
      .select(
        col("n_snapshot"),
        col("n_batch"),
        coalesce(col("n_true_dup"), lit(0L)).as("n_true_dup"),
        (col("n_batch") - coalesce(col("n_true_dup"), lit(0L))).as("n_pass"),
        ((col("n_bloom_hit") - coalesce(col("n_true_dup"), lit(0L))) <=
          ceil(lit(4.0 * fpp) * col("n_batch")) + lit(4L)).as("fp_ok"))
  }
}
