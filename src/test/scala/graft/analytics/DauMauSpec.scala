package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DauMauSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, h: Int = 9) =
    new Timestamp(1700000000000L + (day * 24L + h) * 3600000L)

  test("trailing window, dedup within day, partial edge") {
    val ev = Seq(
      (1L, ts(0)), (1L, ts(0, 15)), (2L, ts(0)), // day0: users {1,2}
      (1L, ts(1)),                               // day1: {1}
      (3L, ts(40))                               // day40: {3} (window slid past)
    ).toDF("user_id", "t")
    val out = EventAnalytics.dauMau(ev, col("user_id"), col("t"), windowDays = 28)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // day0: dau 2, mau 2; day1: dau 1, mau 2 (trailing); day40: 1/1
    assert(out.toSeq === Seq((2L, 2L, 1000000L), (1L, 2L, 500000L),
      (1L, 1L, 1000000L)))
  }

  test("invariants on the events corpus") {
    val out = EventAnalytics.dauMau(table("events"), col("user_id"),
      col("ts")).collect()
    assert(out.nonEmpty)
    // dau <= mau always; ratio consistent; mau never exceeds total users
    val totalUsers = table("events").select("user_id").distinct().count()
    assert(out.forall(r => r.getLong(1) <= r.getLong(2)))
    assert(out.forall(r => r.getLong(2) <= totalUsers))
    assert(out.forall(r =>
      r.getLong(3) === r.getLong(1) * 1000000L / r.getLong(2)))
    // the trailing window accumulates: mau is non-decreasing over the
    // first windowDays days of a 30-day corpus
    val maus = out.map(_.getLong(2))
    assert(maus.zip(maus.tail).take(27).forall { case (a, b) => b >= a })
  }
}
