package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TransitionMatrixSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("bigrams, start state, ppm and ranks on a hand-built log") {
    // user 1: a -> b -> a ; user 2: a -> a
    val ev = Seq(
      (1L, ts(0), 10L, "a"), (1L, ts(1), 11L, "b"), (1L, ts(2), 12L, "a"),
      (2L, ts(0), 20L, "a"), (2L, ts(3), 21L, "a")
    ).toDF("user_id", "t", "event_id", "event_type")
    val m = EventAnalytics.transitionMatrix(ev, col("user_id"), col("t"),
      col("event_id"), col("event_type")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Long]("from_total"),
         r.getAs[Long]("p_ppm"), r.getAs[Int]("rnk"))).toMap
    assert(m(("_start_", "a")) === ((2L, 2L, 1000000L, 1)))
    // count tie between (a,a) and (a,b) breaks by to-state name: a < b
    assert(m(("a", "b")) === ((1L, 2L, 500000L, 2)))
    assert(m(("a", "a")) === ((1L, 2L, 500000L, 1)))
    assert(m(("b", "a")) === ((1L, 1L, 1000000L, 1)))
    assert(m.size === 4)
  }

  test("ties at equal timestamps break by the tie-break column") {
    val ev = Seq(
      (1L, ts(0), 2L, "b"), (1L, ts(0), 1L, "a")
    ).toDF("user_id", "t", "event_id", "event_type")
    val m = EventAnalytics.transitionMatrix(ev, col("user_id"), col("t"),
      col("event_id"), col("event_type")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    // event_id order fixes a before b
    assert(m === Set(("_start_", "a"), ("a", "b")))
  }

  test("row totals: one bigram per event; matrix stays state-bounded") {
    val ev = table("events")
    val m = EventAnalytics.transitionMatrix(ev, col("user_id"), col("ts"),
      col("event_id"), col("event_type"))
    val rows = m.collect()
    assert(rows.map(_.getAs[Long]("n")).sum === ev.count())
    val states = ev.select("event_type").distinct().count()
    assert(rows.length <= ((states + 1) * states).toInt)
    // probabilities per from-state sum to ~1e6 (floor-division slack < #to-states)
    rows.groupBy(_.getString(0)).foreach { case (_, g) =>
      val s = g.map(_.getAs[Long]("p_ppm")).sum
      assert(s <= 1000000L && s > 1000000L - g.length)
    }
  }
}
