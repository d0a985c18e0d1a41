package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GrowthAccountingSpec extends SparkSpec {
  import spark.implicits._

  // week length in ms; align test timestamps to exact epoch weeks
  private def wk(w: Long) = new Timestamp(w * 604800000L + 1000L)

  test("new / retained / resurrected / churned on a hand-built ledger") {
    val ev = Seq(
      (1L, wk(100)), (1L, wk(101)), (1L, wk(103)), // new, retained, resurrected
      (2L, wk(100)),                               // new then churns in 101
      (3L, wk(101))                                // new in 101
    ).toDF("user_id", "t")
    val out = EventAnalytics.growthAccounting(ev, col("user_id"), col("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(out(100L) === ((2L, 2L, 0L, 0L, 0L)))
    // week 101: user1 retained, user3 new; user2 churned
    assert(out(101L) === ((2L, 1L, 1L, 0L, 1L)))
    // week 102 is fully inactive but still ledgered: users 1 and 3
    // (active in 101) churn THERE, not nowhere
    assert(out(102L) === ((0L, 0L, 0L, 0L, 2L)))
    // week 103: user1 resurrected, no churn (nobody was active in 102)
    assert(out(103L) === ((1L, 0L, 0L, 1L, 0L)))
  }

  test("ledger identities hold on the events corpus") {
    val out = EventAnalytics.growthAccounting(table("events"),
      col("user_id"), col("ts")).collect()
    assert(out.nonEmpty)
    // active = new + retained + resurrected, every week
    assert(out.forall(r =>
      r.getLong(1) === r.getLong(2) + r.getLong(3) + r.getLong(4)))
    // churned(w) = active(w-1) - retained(w) for consecutive weeks
    val byWk = out.map(r => r.getLong(0) -> r).toMap
    for (r <- out; p <- byWk.get(r.getLong(0) - 1))
      assert(r.getLong(5) === p.getLong(1) - r.getLong(3))
    // total new across all weeks = total distinct users
    assert(out.map(_.getLong(2)).sum ===
      table("events").select("user_id").distinct().count())
  }
}
