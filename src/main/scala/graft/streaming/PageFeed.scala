package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The streaming twin of keyset pagination
  * ([[graft.text.DocPipeline.pageByQuality]]): a resumable, exactly-once
  * ordered feed per consumer, with the keyset cursor held as per-group
  * state instead of round-tripped by the client.
  *
  * Each consumer's state is TWO longs — the keyset cursor (highest key
  * delivered) and the running delivery count — so state is O(consumers),
  * never O(items). Every micro-batch delivers the batch's items with
  * key strictly above the cursor, in key order, stamped with a global
  * per-consumer sequence number and the page it falls in
  * (`seq / pageSize`); replays and duplicates (key ≤ cursor, or repeated
  * within the batch) are dropped, which is the exactly-once resume-token
  * contract a page server owes its clients. Exact page numbering under
  * the same in-order-delivery contract the streaming funnel documents:
  * keys arrive nondecreasing ACROSS micro-batches (within one batch any
  * order works — the batch is sorted); an out-of-order straggler below
  * the cursor is treated as a replay and dropped rather than renumbering
  * pages already served.
  *
  * State lives as long as the consumer's key does (NoTimeout): the item
  * stream carries no event time to anchor an event-time TTL on, and a
  * processing-time TTL would make the query re-trigger continuously to
  * poll timeouts even with no data. A deployment bounds state by bounding
  * the live consumer population (it is two longs per consumer — 10M
  * consumers is ~160 MB of state fleet-wide); wrap the key with an epoch
  * (consumer_id, day) if consumers must age out.
  */
object PageFeed {

  case class FeedItem(consumer_id: Long, item_key: Long)
  case class FeedDelivery(consumer_id: Long, item_key: Long,
                          seq: Long, page: Long)
  case class FeedCursor(cursor: Long, served: Long)

  def keysetFeedStream(items: Dataset[FeedItem],
                       pageSize: Int): Dataset[FeedDelivery] = {
    require(pageSize > 0, "pageSize must be positive")
    import items.sparkSession.implicits._

    def update(cid: Long, batch: Iterator[FeedItem],
               state: GroupState[FeedCursor]): Iterator[FeedDelivery] = {
      val st = state.getOption.getOrElse(FeedCursor(Long.MinValue, 0L))
      var cursor = st.cursor
      var served = st.served
      val fresh = batch.map(_.item_key).toArray
        .distinct.sorted.filter(_ > cursor)
      val out = fresh.map { k =>
        cursor = k
        val d = FeedDelivery(cid, k, served, served / pageSize)
        served += 1
        d
      }
      state.update(FeedCursor(cursor, served))
      out.iterator
    }

    items
      .groupByKey(_.consumer_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  // ── ranked feed: the batch pager's composite keyset, streamed ─────────

  case class RankedItem(consumer_id: Long, score: Double, item_id: Long)
  case class RankedDelivery(consumer_id: Long, score: Double, item_id: Long,
                            seq: Long, page: Long)
  case class RankedCursor(score: Double, id: Long, served: Long)

  /** [[keysetFeedStream]] under the EXACT pagination order of the batch
    * keyset pager ([[graft.text.DocPipeline.pageByQuality]]): score
    * DESCENDING, item id ASCENDING on ties — so a consumer's streamed
    * page `p` is row-identical to the batch pager's page `p+1` over the
    * same items. The cursor state is the batch pager's keyset
    * (score, id) plus the running count: three fixed-width fields per
    * consumer, O(consumers) state total.
    *
    * Same delivery contract as the plain feed: items must arrive
    * nondecreasing in pagination order ACROSS micro-batches (any order
    * within one — the batch is sorted); anything at-or-before the cursor
    * is a replay and is dropped rather than renumbering served pages.
    *
    * NaN scores are EXCLUDED from the feed, explicitly and up front: NaN
    * has no position in (score desc, id asc) order — every comparison
    * against it is false — so such an item could neither advance the
    * cursor nor be numbered consistently. The filter here makes that a
    * documented delivery-contract exclusion (route NaN rows to a
    * dead-letter sink upstream if they must be accounted for) rather
    * than an incidental drop inside the cursor comparison.
    */
  def rankedFeedStream(items: Dataset[RankedItem],
                       pageSize: Int): Dataset[RankedDelivery] = {
    require(pageSize > 0, "pageSize must be positive")
    import items.sparkSession.implicits._

    // strictly after the cursor in (score desc, id asc) order
    def after(c: RankedCursor, s: Double, i: Long): Boolean =
      s < c.score || (s == c.score && i > c.id)

    def update(cid: Long, batch: Iterator[RankedItem],
               state: GroupState[RankedCursor]): Iterator[RankedDelivery] = {
      val st = state.getOption.getOrElse(
        RankedCursor(Double.PositiveInfinity, Long.MinValue, 0L))
      var cur = st
      val fresh = batch.map(e => (e.score, e.item_id)).toArray.distinct
        .sortBy { case (s, i) => (-s, i) }
      val out = Seq.newBuilder[RankedDelivery]
      fresh.foreach { case (s, i) =>
        if (after(cur, s, i)) {
          out += RankedDelivery(cid, s, i, cur.served, cur.served / pageSize)
          cur = RankedCursor(s, i, cur.served + 1)
        }
      }
      state.update(cur)
      out.result().iterator
    }

    items
      .filter(it => !it.score.isNaN) // contract: NaN is unorderable, excluded
      .groupByKey(_.consumer_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }
}
