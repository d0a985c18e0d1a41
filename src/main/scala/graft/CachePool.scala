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
  * and cheap: run the query, then `CachePool.releaseAll()`.
  *
  * Verify/Bench call it after every query; a library user composing
  * operators in a long-lived session calls it at their own batch boundaries
  * (releasing is safe at any point — an unpersisted frame recomputes).
  */
object CachePool {

  private val frames = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Persist MEMORY_AND_DISK and register for later release. */
  def persist(df: DataFrame): DataFrame = synchronized {
    val p = df.persist(StorageLevel.MEMORY_AND_DISK)
    frames += p
    p
  }

  /** Unpersist every registered frame (non-blocking) and clear the registry. */
  def releaseAll(): Unit = synchronized {
    frames.foreach(_.unpersist(blocking = false))
    frames.clear()
  }

  /** Number of currently registered (not yet released) frames. */
  def registered: Int = synchronized(frames.size)
}
