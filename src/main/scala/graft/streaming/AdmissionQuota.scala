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

  case class ScoredArrival(doc_id: Long, source: String, quality: Double)

  /** One changelog event of [[admitTopKByQuality]]: a document entering
    * (`admit`) or leaving (`evict`) its source's current best-k set.
    */
  case class QuotaEvent(source: String, doc_id: Long, action: String)

  /** Heap members carried across micro-batches — parallel arrays so the
    * state encoder stays a flat product (≤ k entries per source).
    */
  case class TopKState(ids: Array[Long], qs: Array[Double])

  /** The true ONLINE top-k-by-quality quota — admission WITH EVICTION.
    * [[admitFirstK]] is the pure gate (admit-until-spent: cheap, but the
    * budget goes to whoever arrived first); this is the policy a quality
    * -aware ingest wants: every source's CURRENT k best documents, kept
    * current as better ones arrive. A set that can shrink needs
    * retraction, so the output is a CHANGELOG — `admit` when a document
    * enters its source's best-k, `evict` when a later, better arrival
    * pushes it out; the live set at any time is admits minus evicts, and
    * once the stream drains it equals the BATCH top-k
    * ([[graft.text.DocPipeline.sourceQuota]]) exactly.
    *
    * Deterministic contract: arrivals are processed in ascending doc_id
    * within each micro-batch (the batch is buffered and sorted per source
    * — bounded by micro-batch size, the same per-batch bound every
    * stateful sink has; one-shot batch execution buffers the full source,
    * which only the oracle harness runs). A challenger displaces the
    * incumbent worst only on STRICTLY better quality — on ties the
    * incumbent keeps its seat (first-come, and in id order that is also
    * the smaller doc_id, so batch execution replays as: admit iff fewer
    * than k predecessors have quality ≥ yours; evict iff admitted but
    * outside the final per-source top-k by (quality desc, doc_id)).
    * State per source is the k (id, quality) pairs — bounded by
    * k × distinct sources, independent of stream length.
    */
  def admitTopKByQuality(docs: Dataset[ScoredArrival], k: Int): Dataset[QuotaEvent] = {
    import docs.sparkSession.implicits._

    def update(source: String, batch: Iterator[ScoredArrival],
               state: GroupState[TopKState]): Iterator[QuotaEvent] = {
      if (k <= 0) { batch.foreach(_ => ()); return Iterator.empty }
      // head = the current WORST member: lowest quality, largest id on
      // ties (dequeue takes the MAX, so rank by (-quality, id))
      implicit val worstFirst: Ordering[(Double, Long)] =
        Ordering.Tuple2(Ordering.Double.TotalOrdering.reverse, Ordering.Long)
      val heap = new scala.collection.mutable.PriorityQueue[(Double, Long)]()
      state.getOption.foreach(s =>
        s.ids.indices.foreach(i => heap.enqueue((s.qs(i), s.ids(i)))))
      val events = Seq.newBuilder[QuotaEvent]
      batch.toArray.sortBy(_.doc_id).foreach { d =>
        if (heap.size < k) {
          heap.enqueue((d.quality, d.doc_id))
          events += QuotaEvent(source, d.doc_id, "admit")
        } else if (d.quality > heap.head._1) {
          val (_, evictedId) = heap.dequeue()
          heap.enqueue((d.quality, d.doc_id))
          events += QuotaEvent(source, evictedId, "evict")
          events += QuotaEvent(source, d.doc_id, "admit")
        }
      }
      val members = heap.dequeueAll
      state.update(TopKState(members.map(_._2).toArray, members.map(_._1).toArray))
      events.result().iterator
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
