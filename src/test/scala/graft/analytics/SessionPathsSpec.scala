package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SessionPathsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("paths truncate at pathLen, sessions split on the gap, ranks tie by path") {
    val ev = Seq(
      // user 1 session 1: a>b>c>d>e>f -> truncated to a>b>c (pathLen 3)
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"), (1L, ts(2), 3L, "c"),
      (1L, ts(3), 4L, "d"), (1L, ts(4), 5L, "e"), (1L, ts(5), 6L, "f"),
      // gap > 30 min -> session 2: a>b
      (1L, ts(60), 7L, "a"), (1L, ts(61), 8L, "b"),
      // user 2: one session a>b (ties with user 1's), one session b>a
      (2L, ts(0), 9L, "a"), (2L, ts(1), 10L, "b"),
      (2L, ts(90), 11L, "b"), (2L, ts(91), 12L, "a")
    ).toDF("user_id", "t", "event_id", "event_type")
    val out = EventAnalytics.sessionPathsTopK(ev, col("user_id"), col("t"),
      col("event_id"), col("event_type"), pathLen = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq === Seq(("a>b", 2L, 1), ("a>b>c", 1L, 2), ("b>a", 1L, 3)))
  }

  test("k caps the output; every session contributes exactly one path") {
    val ev = table("events")
    val out = EventAnalytics.sessionPathsTopK(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"), k = 7).collect()
    assert(out.length === 7)
    assert(out.map(_.getInt(2)).toSeq === (1 to 7))
    // counts are non-increasing down the ranks
    val ns = out.map(_.getLong(1))
    assert(ns.zip(ns.tail).forall { case (a, b) => a >= b })
  }
}
