package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source ADMISSION quota — the online form of
  * [[graft.text.DocPipeline.sourceQuota]]. Batch quota keeps the k BEST
  * documents per source because it sees them all; a stream cannot rank
  * what it has not seen, so the online policy every ingest gate actually
  * runs is first-k ADMISSION: admit until the source's budget is spent,
  * then drop. Semantics, exactly:
  *
  *  - across micro-batches: first-come-first-served (arrival order);
  *  - within one micro-batch: the k−admitted SMALLEST doc_ids win, via a
  *    bounded max-heap — deterministic under replay, and never buffers
  *    more than the remaining budget per source;
  *  - state per source is ONE long (the admitted count) — bounded by the
  *    number of distinct sources, not by stream length or k.
  *
  * Run on a BATCH Dataset the same code sees each source's rows once, so
  * it degenerates to "the k smallest doc_ids per source" — which is what
  * the SQL oracle replays (`row_number() OVER (ORDER BY doc_id) <= k`).
  */
object AdmissionQuota {

  case class DocArrival(doc_id: Long, source: String)

  case class Admitted(doc_id: Long, source: String, admit_seq: Long)

  def admitFirstK(docs: Dataset[DocArrival], k: Int): Dataset[Admitted] = {
    import docs.sparkSession.implicits._

    def update(source: String, batch: Iterator[DocArrival],
               state: GroupState[Long]): Iterator[Admitted] = {
      val already = state.getOption.getOrElse(0L)
      val budget = math.max(0L, k.toLong - already).toInt
      if (budget == 0) { batch.foreach(_ => ()); return Iterator.empty }
      // bounded max-heap of the `budget` smallest ids in this micro-batch
      val heap = new scala.collection.mutable.PriorityQueue[Long]()(Ordering.Long)
      batch.foreach { d =>
        if (heap.size < budget) heap.enqueue(d.doc_id)
        else if (d.doc_id < heap.head) { heap.dequeue(); heap.enqueue(d.doc_id) }
      }
      val winners = heap.dequeueAll.reverse // ascending doc_id
      state.update(already + winners.size)
      winners.iterator.zipWithIndex.map { case (id, i) =>
        Admitted(id, source, already + i + 1)
      }
    }

    docs.groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }

  case class TimedArrival(doc_id: Long, source: String, ts: Timestamp)

  /** ROLLING admission quota: like [[admitFirstK]], but a source's budget
    * REFILLS once it goes quiet for `ttl` of EVENT time — the shape a
    * forever-running ingest needs, because (a) a crawl source's quota
    * should be per-burst, not per-eternity, and (b) state must not grow
    * with every source ever seen: the event-time timeout evicts a quiet
    * source's counter when the watermark passes its last admission + ttl,
    * so state is bounded by sources ACTIVE within the horizon.
    * `admit_seq` restarts from 1 after a refill — downstream consumers
    * can distinguish bursts by it.
    */
  def admitFirstKRolling(docs: Dataset[TimedArrival], k: Int,
                         ttlMillis: Long = 3600000L,
                         lateness: String = "10 minutes"): Dataset[Admitted] = {
    import docs.sparkSession.implicits._

    def update(source: String, batch: Iterator[TimedArrival],
               state: GroupState[Long]): Iterator[Admitted] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val already = state.getOption.getOrElse(0L)
      val budget = math.max(0L, k.toLong - already).toInt
      var maxTs = Long.MinValue
      // bounded max-heap of the `budget` smallest ids; still scan every
      // row for the event-time horizon
      val heap = new scala.collection.mutable.PriorityQueue[Long]()(Ordering.Long)
      batch.foreach { d =>
        if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
        if (budget > 0) {
          if (heap.size < budget) heap.enqueue(d.doc_id)
          else if (d.doc_id < heap.head) { heap.dequeue(); heap.enqueue(d.doc_id) }
        }
      }
      val winners = heap.dequeueAll.reverse
      state.update(already + winners.size)
      if (maxTs != Long.MinValue) state.setTimeoutTimestamp(maxTs + ttlMillis)
      winners.iterator.zipWithIndex.map { case (id, i) =>
        Admitted(id, source, already + i + 1)
      }
    }

    docs
      .withWatermark("ts", lateness)
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
