package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.streaming.EventStreams.{Event, Session}

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  // offset from epoch: an event AT the initial watermark (epoch 0) would be
  // dropped as late by stateful streaming operators. Hour-aligned so the
  // 50-minute sample still spans exactly one tumbling window.
  private val Base = 960L
  private def ts(min: Long): Timestamp = new Timestamp((Base + min) * 60000L)

  private val sample = Seq(
    // user 1: two sessions split by a 40-minute gap
    Event(1L, ts(0), 1L, "view", 1.0),
    Event(2L, ts(10), 1L, "click", 2.0),
    Event(3L, ts(50), 1L, "view", 3.0),
    // user 2: one session
    Event(4L, ts(5), 2L, "view", 4.0),
    Event(5L, ts(20), 2L, "purchase", 5.0)
  )

  test("keyset feed stream: exactly-once ordered delivery with stable page numbers") {
    import graft.streaming.PageFeed.{FeedDelivery, FeedItem}
    val input = MemoryStream[FeedItem](spark)
    val q = PageFeed.keysetFeedStream(input.toDS(), pageSize = 2)
      .writeStream.format("memory").queryName("feed_out")
      .outputMode("append").start()
    try {
      // consumer 1 receives keys across three batches with an in-batch
      // duplicate (20) and a cross-batch replay (10); consumer 2 interleaves
      input.addData(FeedItem(1L, 10L), FeedItem(1L, 20L), FeedItem(1L, 20L),
        FeedItem(2L, 7L))
      q.processAllAvailable()
      input.addData(FeedItem(1L, 10L), FeedItem(1L, 30L), FeedItem(2L, 9L))
      q.processAllAvailable()
      input.addData(FeedItem(1L, 40L), FeedItem(1L, 50L))
      q.processAllAvailable()
      val got = spark.table("feed_out").as[FeedDelivery].collect()
      val c1 = got.filter(_.consumer_id == 1L).sortBy(_.seq)
        .map(d => (d.item_key, d.seq, d.page)).toList
      // exactly once, key order, page = seq / pageSize across batches
      assert(c1 === List((10L, 0L, 0L), (20L, 1L, 0L), (30L, 2L, 1L),
        (40L, 3L, 1L), (50L, 4L, 2L)))
      val c2 = got.filter(_.consumer_id == 2L).sortBy(_.seq)
        .map(d => (d.item_key, d.seq, d.page)).toList
      assert(c2 === List((7L, 0L, 0L), (9L, 1L, 0L)))
      // parity with the batch keyset ranking: seq is the dense 0-based
      // rank of the distinct keys per consumer
      val batch = got.toSeq.toDS().select("consumer_id", "item_key").distinct()
        .withColumn("seq", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("consumer_id").orderBy("item_key")) - 1)
        .as[(Long, Long, Int)].collect().toSet
      assert(batch === got.map(d => (d.consumer_id, d.item_key, d.seq.toInt)).toSet)
    } finally q.stop()
  }

  test("ranked feed stream pages row-identically to the batch keyset pager") {
    import graft.streaming.PageFeed.{RankedDelivery, RankedItem}
    import graft.text.DocPipeline
    // the real scored corpus, one source's ranking streamed to consumer 1
    val scored = DocPipeline.withQuality(
        table("documents").select(col("doc_id"), col("source"), col("text")),
        col("text"))
      .select("doc_id", "source", "quality_score")
    val src = scored.select("source").orderBy("source").limit(1)
      .as[String].head()
    val ranked = scored.filter(col("source") === src)
      .select("quality_score", "doc_id").as[(Double, Long)]
      .collect().sortBy { case (s, i) => (-s, i) }.toSeq
    assert(ranked.size > 12, s"source $src too small to page")

    // batch truth: pages 1 and 2 of the keyset pager for that source
    def pageIds(p: org.apache.spark.sql.DataFrame): Seq[Long] = p
      .filter(col("source") === src)
      .orderBy(col("quality_score").desc, col("doc_id"))
      .select("doc_id").as[Long].collect().toSeq
    val page1 = DocPipeline.pageByQuality(scored, 5)
    val page2 = DocPipeline.pageByQuality(scored, 5,
      Some(DocPipeline.pageCursors(page1)))

    // stream the same ranking in two micro-batches (split mid-page,
    // in order across batches; each batch internally shuffled)
    val (b1, b2) = ranked.splitAt(7)
    val input = MemoryStream[RankedItem](spark)
    val q = PageFeed.rankedFeedStream(input.toDS(), pageSize = 5)
      .writeStream.format("memory").queryName("ranked_feed_out")
      .outputMode("append").start()
    try {
      input.addData(scala.util.Random.shuffle(b1).map {
        case (s, i) => RankedItem(1L, s, i) }: _*)
      q.processAllAvailable()
      input.addData(scala.util.Random.shuffle(b2).map {
        case (s, i) => RankedItem(1L, s, i) }: _*)
      q.processAllAvailable()
      val got = spark.table("ranked_feed_out").as[RankedDelivery]
        .collect().sortBy(_.seq)
      // every item delivered exactly once, in pagination order
      assert(got.map(d => (d.score, d.item_id)).toSeq === ranked)
      // streamed page p == batch pager page p+1, row for row
      assert(got.filter(_.page == 0L).map(_.item_id).toSeq === pageIds(page1))
      assert(got.filter(_.page == 1L).map(_.item_id).toSeq === pageIds(page2))
    } finally q.stop()
  }

  test("batch sessionize splits on gaps > 30 minutes") {
    val out = EventStreams.sessionize(sample.toDF(), gapSec = 1800L)
      .select("user_id", "session_seq", "n_events").as[(Long, Long, Long)]
      .collect().toSet
    assert(out === Set((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 2L)))
  }

  test("streaming sessionize emits the same closed sessions as batch") {
    val input = MemoryStream[Event](spark)
    val sessions = EventStreams.sessionizeStream(input.toDS(), gapSec = 1800L)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      // push the watermark far past everything so open sessions time out
      input.addData(Event(99L, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(100L, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("sessions_out")
        .filter(col("user_id") < 9)
        .as[Session].collect()
        .map(s => (s.user_id, s.session_start.getTime / 60000 - Base, s.n_events)).toSet
      assert(got === Set((1L, 0L, 2L), (1L, 50L, 1L), (2L, 5L, 2L)))
    } finally q.stop()
  }

  test("native session_window sessionize equals the lag/cumsum form off-boundary") {
    val batch = EventStreams.sessionize(sample.toDF(), gapSec = 1800L)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    val native = EventStreams.sessionizeNative(sample.toDF(), gapSec = 1800L)
      .as[(Long, Timestamp, Timestamp, Long)].collect().toSet
    assert(native === batch)
    // the boundary convention is inclusive in BOTH forms: an event
    // exactly gapSec after the previous one extends the session
    val edge = Seq(Event(1L, ts(0), 7L, "view", 0.0),
      Event(2L, ts(30), 7L, "view", 0.0)).toDF()
    assert(EventStreams.sessionize(edge, 1800L).count() === 1L)
    assert(EventStreams.sessionizeNative(edge, 1800L).count() === 1L)
  }

  test("session_window runs as a watermarked streaming aggregate unchanged") {
    val input = MemoryStream[Event](spark)
    val q = input.toDS().toDF()
      .withWatermark("ts", "30 minutes")
      .groupBy(col("user_id"), session_window(col("ts"), "1800 seconds"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("n_events"))
      .writeStream.format("memory").queryName("native_sessions")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      input.addData(Event(99L, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(100L, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("native_sessions")
        .filter(col("user_id") < 9)
        .as[(Long, Timestamp, Long)].collect()
        .map(s => (s._1, s._2.getTime / 60000 - Base, s._3)).toSet
      assert(got === Set((1L, 0L, 2L), (1L, 50L, 1L), (2L, 5L, 2L)))
    } finally q.stop()
  }

  test("tumblingCountsStream: cross-batch window accumulation, watermark drop, exact finalize") {
    val input = MemoryStream[(Timestamp, Double)](spark)
    val q = EventStreams.tumblingCountsStream(
        input.toDS().toDF("ts", "value"), lateness = "2 hours")
      .writeStream.format("memory").queryName("tumbling_counts")
      .outputMode("append").start()
    try {
      // batch 1: two events in hour H, one in H+1 → watermark = H+70min - 2h
      input.addData((ts(0), 1.0), (ts(10), 2.0), (ts(70), 4.0))
      q.processAllAvailable()
      // batch 2: H gets a THIRD event (window accumulates across batches)
      // plus a 3h-late event (before watermark+window: dropped)
      input.addData((ts(50), 8.0), (new Timestamp(ts(0).getTime - 3L * 3600 * 1000), 100.0))
      q.processAllAvailable()
      // sentinels finalize H and H+1
      input.addData((ts(60 * 24), 0.0)); q.processAllAvailable()
      input.addData((ts(60 * 25), 0.0)); q.processAllAvailable()
      val got = spark.table("tumbling_counts")
        .filter(col("window_start") <= lit(ts(70)))
        .as[(Timestamp, Long, Long)].collect()
        .map(r => (r._1.getTime / 60000 - Base, r._2, r._3)).toSet
      // hour H: 3 events (1+2+8 → 11e6 micros), hour H+1: 1 event; the
      // late row's 100.0 appears nowhere
      assert(got === Set((0L, 3L, 11000000L), (60L, 1L, 4000000L)))
    } finally q.stop()
  }

  test("sessionizeNativeStream: sessions merge across batches and equal the batch form") {
    val input = MemoryStream[(Timestamp, Long)](spark)
    val q = EventStreams.sessionizeNativeStream(
        input.toDS().toDF("ts", "user_id"))
      .writeStream.format("memory").queryName("native_stream_sessions")
      .outputMode("append").start()
    try {
      // user 7's session STRADDLES the batch boundary: 20-minute gap
      input.addData((ts(0), 7L), (ts(10), 7L), (ts(5), 8L))
      q.processAllAvailable()
      input.addData((ts(30), 7L), (ts(90), 8L))
      q.processAllAvailable()
      input.addData((ts(60 * 24), -1L)); q.processAllAvailable()
      input.addData((ts(60 * 25), -1L)); q.processAllAvailable()
      val got = spark.table("native_stream_sessions")
        .filter(col("user_id") >= 0)
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map(r => (r._1, r._2.getTime / 60000 - Base, r._3.getTime / 60000 - Base, r._4))
        .toSet
      // one merged 3-event session for user 7; user 8 splits on the 85-min gap
      assert(got === Set((7L, 0L, 30L, 3L), (8L, 5L, 5L, 1L), (8L, 90L, 90L, 1L)))
      // and the drained rows equal the batch native form on the same events
      val batch = EventStreams.sessionizeNative(
        Seq((ts(0), 7L), (ts(10), 7L), (ts(5), 8L), (ts(30), 7L), (ts(90), 8L))
          .toDF("ts", "user_id"))
        .as[(Long, Timestamp, Timestamp, Long)].collect()
        .map(r => (r._1, r._2.getTime / 60000 - Base, r._3.getTime / 60000 - Base, r._4))
        .toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("streaming drift monitor converges to the batch driftTable row per source") {
    import graft.etl.SnapshotDiff
    val oldSnap = Seq(("A", 0L), ("A", 0L), ("A", 1L), ("A", 1L),
      ("B", 0L), ("B", 1L)).toDF("source", "b")
    val newRows = Seq(("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L),
      ("B", 0L), ("B", 1L))
    val baseline = oldSnap.groupBy("source", "b").count()
      .as[(String, Long, Long)].collect()
      .map { case (s, b, c) => (s, b) -> c }.toMap
    val input = MemoryStream[(String, Long)](spark)
    val q = DriftMonitor.driftStream(input.toDS(), baseline)
      .writeStream.format("memory").queryName("drift_out")
      .outputMode("update").start()
    try {
      // split mid-source so state must carry counts across batches
      val (b1, b2) = newRows.splitAt(3)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      // last emission per source (latest batch id wins: dedupe by re-read order)
      val got = spark.table("drift_out")
        .as[DriftMonitor.DriftRow].collect()
        .groupBy(_.source)
        // the final row per source has the max t_new (counts only grow)
        .map { case (s, rows) => s -> rows.maxBy(_.t_new) }
      val batch = SnapshotDiff.driftTable(oldSnap,
          newRows.toDF("source", "b"), col("source"), col("b"))
        .as[(String, Long, Long, Long, Long, Boolean)].collect()
        .map(r => r._1 -> r).toMap
      batch.foreach { case (s, (_, tOld, tNew, num, den, drift)) =>
        val g = got(s)
        assert((g.t_old, g.t_new, g.tv_num, g.tv_den, g.drift) ===
          ((tOld, tNew, num, den, drift)), s"source $s diverged")
      }
    } finally q.stop()
  }

  test("streaming funnel: depth changelog matches the batch funnel per user") {
    val steps = Seq("signup", "view", "click", "purchase")
    val funnelSample = Seq(
      // user 1: full funnel in order
      Event(1L, ts(0), 1L, "signup", 0.0), Event(2L, ts(1), 1L, "view", 0.0),
      Event(3L, ts(2), 1L, "click", 0.0), Event(4L, ts(3), 1L, "purchase", 0.0),
      // user 2: view precedes signup (ignored), funnel stops at view
      Event(5L, ts(0), 2L, "view", 0.0), Event(6L, ts(1), 2L, "signup", 0.0),
      Event(7L, ts(2), 2L, "view", 0.0),
      // user 3: no signup — depth 0
      Event(8L, ts(0), 3L, "purchase", 0.0))
    val input = MemoryStream[Event](spark)
    val q = EventStreams.funnelStream(input.toDS(), steps)
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").start()
    try {
      // event-time-ordered feed, split across micro-batches mid-funnel
      val (b1, b2) = funnelSample.sortBy(_.ts.getTime).splitAt(4)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
      val got = spark.table("funnel_out")
        .as[EventStreams.FunnelProgress].collect()
        .groupBy(_.user_id).view.mapValues(_.map(_.step).max).toMap
      val batch = graft.analytics.EventAnalytics.funnel(funnelSample.toDF(),
          col("user_id"), col("ts"), col("event_type"), steps)
        .as[(Int, String, Long)].collect()
      // batch counts users per depth; rebuild per-user depth from the
      // stream changelog and compare the step counts
      val streamCounts = (1 to steps.length).map(s =>
        got.values.count(_ >= s).toLong)
      assert(batch.map(_._3).toSeq === streamCounts,
        s"stream depths $got vs batch funnel ${batch.toSeq}")
      assert(!got.contains(3L), "depth-0 user must emit nothing")
    } finally q.stop()
  }

  test("incremental TF-IDF: update-mode df maintenance converges to the batch df") {
    import graft.text.TfIdf
    val batch1 = Seq((1L, "spark spark streams"), (2L, "streams of data"))
    val batch2 = Seq((3L, "spark data pipelines"), (4L, "more data more spark"))
    val allDocs = (batch1 ++ batch2).toDF("doc_id", "text")

    val input = MemoryStream[(Long, String)](spark)
    val q = TfIdf.documentFrequencies(input.toDS().toDF("doc_id", "text"), col("text"))
      .writeStream.format("memory").queryName("tfidf_df")
      .outputMode("update").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      val mid = spark.table("tfidf_df").groupBy("term").agg(max("df").as("df"))
        .as[(String, Long)].collect().toMap
      assert(mid === Map("spark" -> 1L, "streams" -> 2L, "of" -> 1L, "data" -> 1L))

      input.addData(batch2: _*)
      q.processAllAvailable()
      // update mode re-emits refreshed counts; counts only grow, so the
      // max per term is the maintained state — and must equal batch df.
      val got = spark.table("tfidf_df").groupBy("term").agg(max("df").as("df"))
        .as[(String, Long)].collect().toSet
      val batchDf = TfIdf.documentFrequencies(allDocs, col("text"))
        .as[(String, Long)].collect().toSet
      assert(got === batchDf)

      // the re-score half: scoring any batch against the maintained
      // snapshot equals the full-corpus batch topTerms for those docs
      val snapshot = got.toSeq.toDF("term", "df")
      val inc = TfIdf.topTermsAgainst(batch2.toDF("doc_id", "text"), snapshot,
          nDocs = 4L, col("doc_id"), col("text"), k = 3)
        .as[(Long, String, Long, Long, Double)].collect().toSeq
      val full = TfIdf.topTerms(allDocs, col("doc_id"), col("text"), k = 3)
        .filter(col("doc_id") >= 3L)
        .as[(Long, String, Long, Long, Double)].collect().toSeq
      graft.CachePool.releaseAll()
      assert(inc === full)
    } finally q.stop()
  }

  test("curateStream: gate, decontamination and dedup compose in one streaming query") {
    import graft.text.{Decontaminate, DocPipeline}
    val evalDocs = Seq(
      (100L, "held out benchmark question with exactly these eight tokens")).toDF("doc_id", "text")
    val grams = Decontaminate.evalGramHashes(evalDocs, col("doc_id"), col("text"))
    val batch1 = Seq(
      (1L, "a perfectly reasonable document with enough clean tokens"),   // keeps
      (2L, "!!! ??? %%% ### @@@ &&& ***"),                                // punct soup: gated
      (3L, "A  perfectly reasonable document WITH enough clean tokens")) // dup of 1 (normalized)
    val batch2 = Seq(
      (4L, "a perfectly reasonable document with enough clean tokens"),   // cross-batch dup of 1
      (5L, "contains the held out benchmark question with exactly these eight tokens inside"), // contaminated
      (6L, "another good and clean document that also passes the gate"))  // keeps
    val union = (batch1 ++ batch2).toDF("doc_id", "text")

    // dropDuplicates keeps ONE arbitrary member per group, so assert at
    // group level: the soup and the contaminated doc are gone, exactly
    // one of the duplicate trio {1,3,4} survives, doc 6 survives.
    def check(ids: Set[Long]): Unit = {
      assert(ids.intersect(Set(2L, 5L)).isEmpty, s"gated doc leaked: $ids")
      assert(ids.count(Set(1L, 3L, 4L)) === 1, s"dup group not deduped: $ids")
      assert(ids.contains(6L) && ids.size === 2, s"unexpected survivors: $ids")
    }
    check(DocPipeline.curateStream(union, col("doc_id"), col("text"), grams)
      .select("doc_id").as[Long].collect().toSet)

    val input = MemoryStream[(Long, String)](spark)
    val q = DocPipeline.curateStream(
        input.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"), grams)
      .writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("curate_stream").select("doc_id").as[Long].collect().toSet
      check(got)
      // streaming state holds ACROSS micro-batches: the trio's survivor
      // must be a batch-1 arrival (doc 4 arrived second and was dropped)
      assert(!got.contains(4L), s"cross-batch dedup state failed: $got")
    } finally q.stop()
  }

  test("streaming grouped quantile sketch folds micro-batches into per-group state") {
    import graft.analytics.Stats
    val input = MemoryStream[(String, Double)](spark)
    val q = Stats.quantileSketchAgg(input.toDS().toDF("k", "v"), col("k"), col("v"),
        Seq(0.5))
      .writeStream.format("memory").queryName("gq_stream")
      .outputMode("complete").start()
    try {
      // group a: 1..50 then 51..100 across two micro-batches; group b: constant
      input.addData((1 to 50).map(i => ("a", i.toDouble)) ++ Seq(("b", 7.0)): _*)
      q.processAllAvailable()
      input.addData((51 to 100).map(i => ("a", i.toDouble)) ++ Seq(("b", 7.0)): _*)
      q.processAllAvailable()
      val got = spark.table("gq_stream")
        .select(col("k"), element_at(col("qv"), 1).as("p50"), col("n_rows"))
        .as[(String, Double, Long)].collect()
        .map { case (k, p, n) => k -> ((p, n)) }.toMap
      // the sketch folded BOTH micro-batches: median of the merged stream,
      // not of either batch alone (batch 1 alone would give ~25, batch 2
      // alone ~75); accuracy 10000 on 100 rows makes the sketch exact ±1
      assert(got("a")._2 === 100L)
      assert(math.abs(got("a")._1 - 50.0) <= 1.0, s"p50 = ${got("a")._1}")
      assert(got("b") === ((7.0, 2L)))
    } finally q.stop()
  }

  test("streaming NDV sketch merges HLL state across micro-batches") {
    import graft.analytics.Stats
    val input = MemoryStream[(String, Long)](spark)
    val q = Stats.ndvSketchOnly(input.toDS().toDF("k", "v"), col("k"), col("v"))
      .writeStream.format("memory").queryName("ndv_stream")
      .outputMode("complete").start()
    try {
      // group a: values 1..40 then 21..60 (overlap 21..40 must not
      // double-count); group b: the same value twice
      input.addData((1L to 40L).map(("a", _)) ++ Seq(("b", 9L)): _*)
      q.processAllAvailable()
      input.addData((21L to 60L).map(("a", _)) ++ Seq(("b", 9L)): _*)
      q.processAllAvailable()
      val got = spark.table("ndv_stream")
        .select("k", "n_rows", "ndv_est").as[(String, Long, Long)].collect()
        .map { case (k, n, e) => k -> ((n, e)) }.toMap
      assert(got("a")._1 === 80L)
      // HLL at rsd 0.05 on 60 distincts is exact or near-exact; the point
      // is that it merged batches (either batch alone has 40)
      assert(math.abs(got("a")._2 - 60L) <= 3L, s"ndv_est = ${got("a")._2}")
      assert(got("b") === ((2L, 1L)))
    } finally q.stop()
  }

  test("NDV sketch is update-mode legal (no sort on the streaming aggregate)") {
    import graft.analytics.Stats
    val input = MemoryStream[(String, Long)](spark)
    val q = Stats.ndvSketchOnly(input.toDS().toDF("k", "v"), col("k"), col("v"))
      .writeStream.format("memory").queryName("ndv_update")
      .outputMode("update").start()
    try {
      input.addData(("a", 1L), ("a", 2L), ("b", 1L))
      q.processAllAvailable()
      assert(spark.table("ndv_update").count() >= 2)
    } finally q.stop()
  }

  test("dedupStream drops duplicate keys within the watermark") {
    val input = MemoryStream[Event](spark)
    val deduped = EventStreams.dedupStream(input.toDS().toDF(), Seq("event_id"), "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      input.addData(sample: _*) // exact replay
      q.processAllAvailable()
      input.addData(Event(1L, ts(9), 1L, "view", 1.0)) // same id again, later ts
      q.processAllAvailable()
      assert(spark.table("dedup_out").count() === sample.size.toLong)
    } finally q.stop()
  }

  test("stream-stream join pairs events within the time window, state bounded by watermarks") {
    val purchases = MemoryStream[Event](spark)
    val views = MemoryStream[Event](spark)
    val joined = EventStreams.joinStreams(
      purchases.toDS().toDF(), views.toDS().toDF(), "user_id", windowSec = 1200L)
    val q = joined.writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append").start()
    try {
      views.addData(
        Event(10L, ts(0), 1L, "view", 0.0),   // 15 min before purchase → in window
        Event(11L, ts(14), 1L, "view", 0.0),  // 1 min before → in window
        Event(12L, ts(16), 1L, "view", 0.0),  // AFTER the purchase → out
        Event(13L, ts(5), 2L, "view", 0.0))   // other user
      purchases.addData(Event(20L, ts(15), 1L, "purchase", 9.99))
      q.processAllAvailable()
      val got = spark.table("ss_join_out")
        .select("l_id", "r_id").as[(Long, Long)].collect().toSet
      assert(got === Set((20L, 10L), (20L, 11L)))
    } finally q.stop()
  }

  test("stream-static enrichment broadcast-joins each micro-batch against the dim") {
    val input = MemoryStream[Event](spark)
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val enriched = EventStreams.enrichStream(input.toDS().toDF(), dim, "user_id")
    val q = enriched.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      val got = spark.table("enrich_out")
        .select("event_id", "tier").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "gold"), (2L, "gold"), (3L, "gold"),
        (4L, "silver"), (5L, "silver")))
    } finally q.stop()
  }

  test("batch tumblingAgg buckets by epoch-aligned windows") {
    val out = EventStreams.tumblingAgg(sample.toDF(), "1 hour")
      .select("n_events", "n_users").as[(Long, Long)].collect().toSeq
    assert(out === Seq((5L, 2L)))
  }

  test("streaming tumblingAgg over a watermark produces finalized windows") {
    val input = MemoryStream[Event](spark)
    val agg = EventStreams.tumblingAggStream(input.toDS().toDF(), "1 hour", "10 minutes")
    val q = agg.writeStream.format("memory").queryName("windows_out")
      .outputMode("append").start()
    try {
      input.addData(sample: _*)
      q.processAllAvailable()
      input.addData(Event(99L, ts(10000), 9L, "view", 0.0))
      q.processAllAvailable()
      input.addData(Event(100L, ts(20000), 9L, "view", 0.0))
      q.processAllAvailable()
      val got = spark.table("windows_out")
        .filter(col("window_start") === ts(0))
        .select("n_events").as[Long].collect().toSeq
      assert(got === Seq(5L))
    } finally q.stop()
  }

  test("curateStreamWatermarked: dup within the delay dropped, state evicted past it") {
    import graft.text.{Decontaminate, DocPipeline}
    val evalDocs = Seq(
      (100L, "held out benchmark question with exactly these eight tokens")).toDF("doc_id", "text")
    val grams = Decontaminate.evalGramHashes(evalDocs, col("doc_id"), col("text"))
    val textA = "a perfectly reasonable document with enough clean tokens"
    val input = MemoryStream[(Long, Timestamp, String)](spark)
    val q = DocPipeline.curateStreamWatermarked(
        input.toDS().toDF("doc_id", "ts", "text"), col("doc_id"), col("text"),
        col("ts"), "10 minutes", grams)
      .writeStream.format("memory").queryName("curate_wm")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, ts(0), textA),
        (2L, ts(0), "another good and clean document that also passes the gate"))
      q.processAllAvailable()
      // same normalized text 5 min later — inside the delay: dropped
      input.addData((3L, ts(5), "  " + textA.toUpperCase + "  "))
      q.processAllAvailable()
      // a clean rider far ahead advances the watermark past key A's horizon
      input.addData((9L, ts(200), "watermark advancing clean rider document with plenty of tokens"))
      q.processAllAvailable()
      // the same text long past the delay: state evicted → re-admitted
      // (a re-crawl, not a storm; batch dedup downstream owns it)
      input.addData((4L, ts(210), textA))
      q.processAllAvailable()
      val ids = spark.table("curate_wm").select("doc_id").as[Long].collect().toSet
      assert(ids === Set(1L, 2L, 9L, 4L), s"got $ids")
    } finally q.stop()
  }

  test("q_stream_quota: budget carries across the batch boundary; every source admits exactly k") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q_stream_quota")(spark, Sf)
      .select("source", "doc_id", "admit_seq")
      .as[(String, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    val bySource = got.groupBy(_._1)
    assert(bySource.size === 20, "all sources must be admitted")
    val want = table("documents").select(col("source"), col("doc_id"))
      .as[(String, Long)].collect().toSeq.groupBy(_._1)
      .map { case (s, rows) => s -> rows.map(_._2).sorted.take(10) }
    bySource.foreach { case (src, rows) =>
      assert(rows.size === 10, s"$src must spend its whole budget (4 + 6)")
      val bySeq = rows.sortBy(_._3)
      assert(bySeq.map(_._3) === (1L to 10L), s"$src admit_seq dense")
      // batch 1 held the 4 smallest, batch 2 topped up with the next 6 —
      // so the admitted set is the 10 smallest ids, in id order
      assert(bySeq.map(_._2) === want(src), s"$src admitted ids")
    }
  }

  test("admission quota: batch = k-smallest per source; stream caps across micro-batches") {
    import graft.streaming.AdmissionQuota
    import graft.streaming.AdmissionQuota.{Admitted, DocArrival}
    val batch1 = Seq(DocArrival(2L, "web"), DocArrival(1L, "web"), DocArrival(10L, "books"))
    val batch2 = Seq(DocArrival(3L, "web"), DocArrival(4L, "web"), DocArrival(11L, "books"))
    // batch mode: each group seen once → the k smallest doc_ids per source
    val batchOut = AdmissionQuota.admitFirstK((batch1 ++ batch2).toDS(), k = 3)
      .collect().toSet
    assert(batchOut === Set(
      Admitted(1L, "web", 1L), Admitted(2L, "web", 2L), Admitted(3L, "web", 3L),
      Admitted(10L, "books", 1L), Admitted(11L, "books", 2L)))

    val input = MemoryStream[DocArrival](spark)
    val q = AdmissionQuota.admitFirstK(input.toDS(), k = 3)
      .writeStream.format("memory").queryName("admit_out")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("admit_out").as[Admitted].collect().toSet
      // ids arrived in ascending order across batches, so stream == batch
      assert(got === batchOut)
      // budget spent: a smaller id arriving later is NOT admitted — online
      // admission is first-come, unlike the batch rank
      input.addData(DocArrival(0L, "web"))
      q.processAllAvailable()
      assert(spark.table("admit_out").count() === batchOut.size.toLong)
    } finally q.stop()
  }

  test("classifier scoring is a stateless map: streaming scores equal batch scores") {
    import graft.text.QualityClassifier
    val pos = (1L to 20L).map(i => (i, s"clean doc $i with plain tokens")).toDF("doc_id", "text")
    val neg = (101L to 120L).map(i => (i, s"clean doc $i with plain tokens zxq zxq junkmarker"))
      .toDF("doc_id", "text")
    val model = QualityClassifier.fit(pos, neg, col("doc_id"), col("text"),
      buckets = 256, iters = 20, lr = 2.0)
    val rows = Seq(
      (900L, "a fresh clean doc with plain tokens"),
      (901L, "zxq zxq junkmarker zxq"))
    val batch = QualityClassifier.score(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"), model)
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    val input = MemoryStream[(Long, String)](spark)
    val q = QualityClassifier.score(input.toDS().toDF("doc_id", "text"),
        col("doc_id"), col("text"), model)
      .writeStream.format("memory").queryName("qc_scores")
      .outputMode("append").start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("qc_scores")
        .select("doc_id", "margin").as[(Long, Double)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
    graft.CachePool.releaseAll()
  }

  test("top-k-by-quality quota: eviction changelog, stream parity, net set = batch top-k") {
    import graft.streaming.AdmissionQuota
    import graft.streaming.AdmissionQuota.{QuotaEvent, ScoredArrival}
    // web, k=2: 1(q.5) admit, 2(q.9) admit, 3(q.7) evicts 1, 4(q.7) ties
    // the incumbent 3 → rejected, 5(q.8) evicts 3. Final set {2, 5}.
    val batch1 = Seq(
      ScoredArrival(2L, "web", 0.9), ScoredArrival(1L, "web", 0.5),
      ScoredArrival(3L, "web", 0.7), ScoredArrival(10L, "books", 0.4))
    val batch2 = Seq(ScoredArrival(4L, "web", 0.7), ScoredArrival(5L, "web", 0.8))
    val expected = Set(
      QuotaEvent("web", 1L, "admit"), QuotaEvent("web", 2L, "admit"),
      QuotaEvent("web", 1L, "evict"), QuotaEvent("web", 3L, "admit"),
      QuotaEvent("web", 3L, "evict"), QuotaEvent("web", 5L, "admit"),
      QuotaEvent("books", 10L, "admit"))

    val batchOut = AdmissionQuota.admitTopKByQuality((batch1 ++ batch2).toDS(), k = 2)
      .collect().toSet
    assert(batchOut === expected)
    // the live set (admits minus evicts) equals the batch per-source top-k
    val admits = batchOut.filter(_.action == "admit").map(e => (e.source, e.doc_id))
    val evicts = batchOut.filter(_.action == "evict").map(e => (e.source, e.doc_id))
    assert(admits -- evicts === Set(("web", 2L), ("web", 5L), ("books", 10L)))

    // streamed in two id-ordered micro-batches: same changelog, with the
    // heap state (members + qualities) carried across the batch boundary
    val input = MemoryStream[ScoredArrival](spark)
    val q = AdmissionQuota.admitTopKByQuality(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_quota")
      .outputMode("append").start()
    try {
      input.addData(batch1: _*)
      q.processAllAvailable()
      input.addData(batch2: _*)
      q.processAllAvailable()
      val got = spark.table("topk_quota").as[QuotaEvent].collect().toSet
      assert(got === batchOut)
    } finally q.stop()
  }

  test("rolling admission quota refills after the source goes quiet for the TTL") {
    import graft.streaming.AdmissionQuota
    import graft.streaming.AdmissionQuota.TimedArrival
    val input = MemoryStream[TimedArrival](spark)
    val q = AdmissionQuota.admitFirstKRolling(input.toDS(), k = 2,
        ttlMillis = 60L * 60000L, lateness = "10 minutes")
      .writeStream.format("memory").queryName("admit_roll")
      .outputMode("append").start()
    try {
      // burst 1: budget of 2 admits ids 1,2; id 3 rejected
      input.addData(
        TimedArrival(1L, "web", ts(0)), TimedArrival(2L, "web", ts(1)),
        TimedArrival(3L, "web", ts(2)))
      q.processAllAvailable()
      // same burst window: still rejected
      input.addData(TimedArrival(4L, "web", ts(30)))
      q.processAllAvailable()
      // another source far ahead pushes the watermark past 30min + 60min
      // TTL → web's counter evicts
      input.addData(TimedArrival(90L, "books", ts(300)))
      q.processAllAvailable()
      input.addData(TimedArrival(91L, "books", ts(320)))
      q.processAllAvailable()
      // burst 2, long after the TTL: budget refilled, admit_seq restarts
      input.addData(TimedArrival(5L, "web", ts(330)), TimedArrival(6L, "web", ts(331)))
      q.processAllAvailable()
      input.addData(TimedArrival(99L, "books", ts(400)))
      q.processAllAvailable()
      val got = spark.table("admit_roll")
        .filter(col("source") === "web")
        .select("doc_id", "admit_seq").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 1L), (2L, 2L), (5L, 1L), (6L, 2L)), s"got $got")
    } finally q.stop()
  }
}
