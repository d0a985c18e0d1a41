package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunnelWindowedSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Long) = new Timestamp(1700000000000L + h * 3600000L)

  test("deadline binds; medians are floor-second exact") {
    val ev = Seq(
      // user 1 completes: signup@0, view@+2h, click@+3h, purchase@+4h
      (1L, ts(0), "signup"), (1L, ts(2), "view"), (1L, ts(3), "click"),
      (1L, ts(4), "purchase"),
      // user 2: view 30h after signup -> misses the 24h deadline
      (2L, ts(0), "signup"), (2L, ts(30), "view"),
      // user 3: signup + view@+6h, no click
      (3L, ts(0), "signup"), (3L, ts(6), "view")
    ).toDF("user_id", "t", "event_type")
    val out = EventAnalytics.funnelWindowed(ev, col("user_id"), col("t"),
      col("event_type"), Seq("signup", "view", "click", "purchase"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out(0) === ((1, "signup", 3L, Some(0.0))))
    // views: users 1 (2h) and 3 (6h); median = 4h = 14400s
    assert(out(1) === ((2, "view", 2L, Some(14400.0))))
    assert(out(2) === ((3, "click", 1L, Some(3600.0))))
    assert(out(3) === ((4, "purchase", 1L, Some(3600.0))))
  }

  test("empty tail steps report zero users and null median") {
    val ev = Seq((1L, ts(0), "signup")).toDF("user_id", "t", "event_type")
    val out = EventAnalytics.funnelWindowed(ev, col("user_id"), col("t"),
      col("event_type"), Seq("signup", "view")).collect()
    assert(out(1).getLong(2) === 0L && out(1).isNullAt(3))
  }

  test("strict counts never exceed the unbounded funnel's") {
    val ev = table("events")
    val strict = EventAnalytics.funnelWindowed(ev, col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val loose = EventAnalytics.funnel(ev, col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view", "click", "purchase"))
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert((1 to 4).forall(k => strict(k) <= loose(k)))
    assert(strict(1) === loose(1)) // step 1 has no deadline
    // counts shrink monotonically down the funnel
    assert((1 to 3).forall(k => strict(k) >= strict(k + 1)))
  }
}
