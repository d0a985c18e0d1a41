package graft.analytics

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class EventAnalyticsSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private def ev(rows: Seq[(Long, Long, String)]) =
    rows.toDF("user_id", "t", "event_type")
      .withColumn("ts", timestamp_seconds(col("t")))

  test("funnel: strictly-after semantics, out-of-order steps don't count") {
    val events = ev(Seq(
      // user 1: clean full funnel
      (1L, 1L, "signup"), (1L, 2L, "view"), (1L, 3L, "click"), (1L, 4L, "purchase"),
      // user 2: view@3 precedes signup@5 (ignored); click@6 precedes the
      // qualifying view@7 (ignored); purchase@8 precedes the qualifying
      // click@9 — funnel stops at depth 3
      (2L, 5L, "signup"), (2L, 3L, "view"), (2L, 7L, "view"),
      (2L, 6L, "click"), (2L, 9L, "click"), (2L, 8L, "purchase"),
      // user 3: no signup — depth 0, never counted
      (3L, 1L, "view"), (3L, 2L, "click"), (3L, 3L, "purchase"),
      // user 4: signup only
      (4L, 1L, "signup"), (4L, 1L, "signup"),
      // user 5: view at the SAME second as signup — strict > excludes it
      (5L, 1L, "signup"), (5L, 1L, "view")))
    val got = EventAnalytics.funnel(events, col("user_id"), col("ts"),
        col("event_type"), Seq("signup", "view", "click", "purchase"))
      .select("step", "step_name", "n_users")
      .as[(Int, String, Long)].collect().toList
    assert(got === List(
      (1, "signup", 4L), (2, "view", 2L), (3, "click", 2L), (4, "purchase", 1L)))
  }

  test("funnel plans ONE user-keyed exchange, not one join per step") {
    val events = ev(Seq((1L, 1L, "signup"), (1L, 2L, "view")))
    val df = EventAnalytics.funnel(events, col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view", "click", "purchase"))
    df.collect()
    val shuffles = collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeExec => s
    }
    // user-keyed agg + the 1-row global agg + the 4-row final sort
    assert(shuffles.size <= 3, s"per-step re-joins would add more:\n$shuffles")
  }

  test("retentionWeekly: integer epoch-week cohorts and offsets") {
    // week 0 = 1970-01-01..07, week 1 starts 01-08
    def day(d: String) = java.sql.Date.valueOf(d).getTime / 1000
    val events = ev(Seq(
      (1L, day("1970-01-02"), "view"),   // cohort week 0
      (1L, day("1970-01-16"), "view"),   // active week 2
      (2L, day("1970-01-09"), "view"),   // cohort week 1
      (2L, day("1970-01-10"), "view")))  // same week — distinct'd
    val got = EventAnalytics.retentionWeekly(events, col("user_id"), col("ts"))
      .as[(Long, Long, Long)].collect().toList
    graft.CachePool.releaseAll()
    assert(got === List((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L)))
  }

  test("gapFillDaily forward-fills missing days; checksum pins every position") {
    def day(d: String) = java.sql.Date.valueOf(d).getTime / 1000
    val events = ev(Seq(
      (1L, day("1970-01-01"), "a"), (1L, day("1970-01-01") + 60, "b"),
      (1L, day("1970-01-04"), "c"),
      (2L, day("1970-02-01"), "a")))
    val got = EventAnalytics.gapFillDaily(events, col("user_id"), col("ts"))
      .as[(Long, Long, Long, Long)].collect().toList
    graft.CachePool.releaseAll()
    // user 1 grid = 4 days, filled series [2,2,2,1]:
    // checksum = 1·2 + 2·2 + 3·2 + 4·1 = 16
    assert(got === List((1L, 4L, 2L, 16L), (2L, 1L, 1L, 1L)))
  }

  test("gapFillDaily: every window is user-partitioned, never global") {
    def day(d: String) = java.sql.Date.valueOf(d).getTime / 1000
    val events = ev(Seq((1L, day("1970-01-01"), "a"), (1L, day("1970-01-03"), "b")))
    val df = EventAnalytics.gapFillDaily(events, col("user_id"), col("ts"))
    df.collect()
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    graft.CachePool.releaseAll()
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"unpartitioned window in gap fill:\n$windows")
  }

  test("ewmaDaily: exact floor-division recurrence per key") {
    // key a: daily counts 4, 8, 4 → s = 4e6, (8e6+3·4e6)//4 = 5e6,
    // (4e6+3·5e6)//4 = 4_750_000; key b: single day, s = c·scale
    val day = 86400L
    val rows =
      Seq.fill(4)((1L, 0L * day, "a")) ++ Seq.fill(8)((1L, 1L * day, "a")) ++
        Seq.fill(4)((2L, 2L * day, "a")) ++ Seq((3L, 0L * day, "b"))
    val got = EventAnalytics.ewmaDaily(ev(rows), col("event_type"), col("ts"))
      .select(col("k"), col("n_events"), col("ewma_mu"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("a", 4L, 4000000L), ("a", 8L, 5000000L), ("a", 4L, 4750000L),
      ("b", 1L, 1000000L)))
  }

  test("ewmaDaily range bound restricts the fold to the reporting window") {
    val day = 86400L
    // three days of data; range pins days 0-1 (1970-01-01/02), so day 2
    // never enters the per-key array and the recurrence restarts nowhere
    val rows = Seq.fill(4)((1L, 0L * day, "a")) ++ Seq.fill(8)((1L, 1L * day, "a")) ++
      Seq.fill(4)((2L, 2L * day, "a"))
    val got = EventAnalytics.ewmaDaily(ev(rows), col("event_type"), col("ts"),
        range = Some(("1970-01-01", "1970-01-02")))
      .select(col("n_events"), col("ewma_mu"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((4L, 4000000L), (8L, 5000000L)))
  }

  test("ewmaAnomalies: burst and drop fences fire on the right days only") {
    val day = 86400L
    // counts 4, 4, 12 (burst: 12 > 2·4), then 1 (drop: 2·1 < 6 trend)
    val rows = Seq.fill(4)((1L, 0L * day, "a")) ++ Seq.fill(4)((1L, 1L * day, "a")) ++
      Seq.fill(12)((1L, 2L * day, "a")) ++ Seq((1L, 3L * day, "a"))
    val got = EventAnalytics.ewmaAnomalies(ev(rows), col("event_type"), col("ts"))
      .select(col("n_events"), col("is_burst"), col("is_drop"))
      .as[(Long, Boolean, Boolean)].collect().toSeq
    assert(got === Seq(
      (4L, false, false),  // day 1: no baseline
      (4L, false, false),  // steady
      (12L, true, false),  // 12e6 > 2·4e6
      (1L, false, true)))  // trend (4e6·1+3·4e6)//4→4e6 → (12e6+3·4e6)//4=6e6; 2·1e6 < 6e6
  }
}
