package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  private def run(rows: Seq[(Long, Timestamp, Long, String)]) =
    EventAnalytics.attribution(
      rows.toDF("user_id", "t", "event_id", "event_type"),
      col("user_id"), col("t"), col("event_id"), col("event_type"),
      col("event_type") === "purchase", lookbackHours = 6)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

  test("first/last/linear credits, lookback, zero-touch, trailing drop") {
    val m = run(Seq(
      // user 1: view,click -> purchase | view -> purchase | purchase | click (trailing)
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "click"), (1L, ts(2), 3L, "purchase"),
      (1L, ts(3), 4L, "view"), (1L, ts(4), 5L, "purchase"),
      (1L, ts(5), 6L, "purchase"),
      (1L, ts(6), 7L, "click"),
      // user 2: view 7h before conversion (outside 6h lookback), click 1h before
      (2L, ts(0), 8L, "view"), (2L, ts(360), 9L, "click"), (2L, ts(420), 10L, "purchase")
    ))
    // channel -> (first_n, last_n, linear_ppm, n_touches)
    assert(m("view") === ((2L, 1L, 1500000L, 2L)))
    assert(m("click") === ((1L, 2L, 1500000L, 2L)))
    assert(m("_none_") === ((1L, 1L, 0L, 0L)))
    assert(m.size === 3)
  }

  test("linear credit splits per channel: floor(cnt*1e6/n_att)") {
    // 2 views + 1 click on one conversion: view floor(2e6/3)=666666,
    // click floor(1e6/3)=333333 — per-CHANNEL flooring, so a channel
    // holding all touches keeps the full 1e6 (no per-touch floor loss)
    val m = run(Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "view"), (1L, ts(2), 3L, "click"),
      (1L, ts(3), 4L, "purchase")))
    assert(m("view") === ((1L, 0L, 666666L, 2L)))
    assert(m("click") === ((0L, 1L, 333333L, 1L)))
    val m2 = run(Seq(
      (1L, ts(0), 1L, "view"), (1L, ts(1), 2L, "view"), (1L, ts(2), 3L, "view"),
      (1L, ts(3), 4L, "purchase")))
    assert(m2("view") === ((1L, 1L, 1000000L, 3L)))
  }

  test("every conversion is credited exactly once for first and last") {
    val ev = table("events")
      .filter(col("event_type").isin("signup", "view", "click", "purchase"))
    val out = EventAnalytics.attribution(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), col("event_type") === "purchase")
      .collect()
    val nConv = ev.filter(col("event_type") === "purchase").count()
    assert(out.map(_.getLong(1)).sum === nConv) // first_n sums to #conversions
    assert(out.map(_.getLong(2)).sum === nConv) // last_n too
    // linear ppm per conversion sums to <= 1e6 (floor slack), so the
    // grand total is bounded by conversions-with-touches * 1e6
    assert(out.map(_.getLong(3)).sum <= nConv * 1000000L)
    // the short lookback must leave some touches unattributed
    val nTouch = ev.filter(col("event_type") =!= "purchase").count()
    assert(out.map(_.getLong(4)).sum < nTouch)
  }
}
