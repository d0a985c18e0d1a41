package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.dedup.MinHashLsh

/** Online near-duplicate CANDIDATE detection over a document stream.
  *
  * Per-row (stateless) work reuses the batch MinHash expressions: shingle
  * → signature → LSH band buckets. The stateful step keys by
  * (band, bucket) and keeps up to `maxPerBucket` (doc_id, signature)
  * pairs per bucket; a new arrival is compared against its bucket's
  * residents only — the streaming analogue of the batch band self-join.
  *
  * Emitted rows are candidate pairs (doc, resident, estimated Jaccard ≥
  * threshold), possibly once per shared band; the tiny downstream
  * `groupBy(pair).max` — or the batch pipeline the candidates feed — does
  * final scoring. State is bounded: buckets cap at `maxPerBucket`
  * (oldest evicted), so memory is O(buckets × cap), independent of
  * stream length.
  */
object StreamingDedup {

  case class BucketDoc(bucket_key: String, doc_id: Long, sig: Array[Long])

  case class NearDupHit(doc_id: Long, matched_id: Long, est_jaccard: Double,
                        bucket_key: String)

  private def estJaccard(a: Array[Long], b: Array[Long]): Double = {
    val n = math.min(a.length, b.length)
    var same = 0
    var i = 0
    while (i < n) { if (a(i) == b(i)) same += 1; i += 1 }
    if (n == 0) 0.0 else same.toDouble / n
  }

  /** Stateless prefix: docs(doc_id, text) → one row per (band, bucket).
    * `weighted = true` signs the gram BAG (per-occurrence instance hashes,
    * exactly [[MinHashLsh.weightedSignatures]]), so the downstream state
    * comparison estimates the frequency-weighted Jaccard — batch and
    * stream stay bit-identical per form because both build signatures
    * from the same native expressions.
    */
  def bucketed(docs: DataFrame, k: Int = 3, bands: Int = 16,
               rowsPerBand: Int = 4, weighted: Boolean = false): Dataset[BucketDoc] = {
    import docs.sparkSession.implicits._
    val p = bands * rowsPerBand
    val hashes =
      if (weighted)
        graft.functions.TextHashExprs.bagInstanceHashes(
          MinHashLsh.bagShingleHashes(col("text"), k))
      else MinHashLsh.shingleHashes(col("text"), k)
    docs
      .withColumn("sig", MinHashLsh.signature(hashes, p))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(
          sequence(lit(0), lit(bands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .select(concat(col("pos"), lit(":"), col("col")).as("bucket_key"),
        col("doc_id"), col("sig"))
      .as[BucketDoc]
  }

  /** Stateful step + full pipeline: candidate hits above `threshold`.
    *
    * State bounds: each bucket caps at `maxPerBucket` residents, and with
    * the default `ttl` a bucket expires that long after its last arrival
    * (processing-time timeout) — so the bucket-COUNT dimension of state
    * is bounded by the dedup horizon, not the stream length. A duplicate
    * arriving after `ttl` of bucket silence is missed here; the batch
    * dedup pass over the accumulated corpus is the backstop.
    *
    * `ttl = None` disables expiry (state grows with distinct content) —
    * it exists for continuous-trigger test harnesses, where timeout-driven
    * empty batches keep `processAllAvailable` from ever draining.
    */
  def nearDupCandidates(docs: DataFrame, threshold: Double = 0.5,
                        k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                        maxPerBucket: Int = 64,
                        ttl: Option[java.time.Duration] = Some(java.time.Duration.ofHours(6)),
                        weighted: Boolean = false): Dataset[NearDupHit] = {
    import docs.sparkSession.implicits._

    def update(key: String, batch: Iterator[BucketDoc],
               state: GroupState[List[(Long, Array[Long])]]): Iterator[NearDupHit] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var residents = state.getOption.getOrElse(Nil)
        val hits = List.newBuilder[NearDupHit]
        batch.foreach { d =>
          residents.foreach { case (rid, rsig) =>
            if (rid != d.doc_id) {
              val ej = estJaccard(d.sig, rsig)
              if (ej >= threshold) hits += NearDupHit(d.doc_id, rid, ej, key)
            }
          }
          residents = ((d.doc_id, d.sig) :: residents).take(maxPerBucket)
        }
        state.update(residents)
        ttl.foreach(t => state.setTimeoutDuration(t.toMillis))
        hits.result().iterator
      }
    }

    val timeoutConf =
      if (ttl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    bucketed(docs, k, bands, rowsPerBand, weighted)
      .groupByKey(_.bucket_key)
      .flatMapGroupsWithState(OutputMode.Append, timeoutConf)(update)
  }
}
