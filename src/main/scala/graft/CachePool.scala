package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Registry for operator-internal persisted frames.
  *
  * Several operators persist a derived frame on purpose (signatures, gram
  * inverted indexes) because both sides of a self-join would otherwise
  * re-derive it. Those persists outlive the operator call — Spark caching is
  * tied to the materialized plan, and the consuming action happens later, in
  * caller code. This registry makes the caller's release obligation explicit
  * and cheap: run the query, then release.
  *
  * Registrations are keyed by the registering thread's job group
  * (`spark.jobGroup.id`, a thread-local), so concurrent queries in one
  * SparkSession can release their own frames without degrading each other's
  * still-running plans to recompute: a harness that tags each query with
  * `setJobGroup` calls [[releaseGroup]] for exactly that query's frames.
  * Frames registered outside any job group live under `None` and fall to
  * [[releaseAll]] (the single-user batch-boundary path — releasing is safe
  * at any point; an unpersisted frame recomputes).
  */
object CachePool {

  private val frames =
    scala.collection.mutable.ArrayBuffer.empty[(Option[String], DataFrame)]

  private def currentGroup(df: DataFrame): Option[String] =
    Option(df.sparkSession.sparkContext.getLocalProperty("spark.jobGroup.id"))

  /** Persist MEMORY_AND_DISK and register under the calling thread's job
    * group for later release.
    */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    frames += ((currentGroup(p), p))
    p
  }

  /** Unpersist every frame registered under `groupId` (non-blocking). */
  def releaseGroup(groupId: String): Unit = release(Some(groupId))

  /** Unpersist ONE registered frame (non-blocking) and drop it from the
    * registry — the eager-release path for operators that persist a chain
    * of intermediates where each round supersedes the last (e.g. the beam
    * search's seen-set): release the superseded frame as soon as its
    * successor is materialized instead of parking every round's frame
    * until the batch-boundary releaseAll. Matching is by REFERENCE
    * identity: callers must pass the exact object [[persist]] returned —
    * a re-derived or transformed frame matches nothing. Releasing a
    * frame that was never registered (or already released) is a no-op,
    * but a MISS on a frame that is still registered under another
    * reference would leak it until releaseAll, so a miss is logged
    * (ADVICE r17: the API otherwise makes misuse undetectable).
    */
  def release(df: DataFrame): Unit = synchronized {
    val (hit, keep) = frames.partition(_._2 eq df)
    if (hit.isEmpty && frames.nonEmpty) {
      System.err.println(
        "[CachePool] release(df) matched no registered frame — pass the " +
          s"exact reference persist() returned (${frames.size} still registered)")
    }
    hit.foreach(_._2.unpersist(blocking = false))
    frames.clear()
    frames ++= keep
  }

  /** Unpersist every registered frame (non-blocking) and clear the
    * registry — the batch-boundary call for single-query sessions.
    */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_._2.unpersist(blocking = false))
    frames.clear()
  }

  private def release(g: Option[String]): Unit = synchronized {
    val (hit, keep) = frames.partition(_._1 == g)
    hit.foreach(_._2.unpersist(blocking = false))
    frames.clear()
    frames ++= keep
  }

  /** Number of currently registered (not yet released) frames. */
  def registered: Int = synchronized(frames.size)

  /** Unpersists the block-manager storage behind an EAGER
    * `localCheckpoint(true)` frame (non-blocking). `Dataset.localCheckpoint`
    * caches the materialized internal RDD and wraps it in a `LogicalRDD`
    * scan; nothing releases those blocks until RDD garbage collection, so
    * an operator that checkpoints per-call intermediates (the
    * recache-by-path pinning discipline of the graph maintenance ops)
    * accumulates storage across a long-lived session (ADVICE r18). This
    * walks the frame's analyzed plan to the wrapped RDD and unpersists it
    * directly — call it only once every plan derived from the frame has
    * been consumed: a localCheckpoint is NOT recomputable, so a
    * still-pending plan rooted at it would fail. No-op for frames that
    * are not local checkpoints.
    */
  def releaseCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
