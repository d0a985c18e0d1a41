package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PeakConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Long) = new Timestamp(1700000000000L + m * 60000L)

  private def run(iv: Seq[(Timestamp, Timestamp)]) = {
    val r = EventAnalytics.peakConcurrency(iv.toDF("st", "en"), col("st"),
      col("en")).collect()(0)
    (r.getLong(0), r.getLong(1), r.getTimestamp(2))
  }

  test("overlaps, touching intervals count, first peak instant") {
    // [0,10], [5,15], [10,20]: at t=10 all three touch -> peak 3
    val (n, peak, at) = run(Seq((ts(0), ts(10)), (ts(5), ts(15)),
      (ts(10), ts(20))))
    assert(n === 3L && peak === 3L && at === ts(10))
  }

  test("disjoint intervals peak at 1, at the earliest start") {
    val (n, peak, at) = run(Seq((ts(10), ts(11)), (ts(0), ts(1))))
    assert(n === 2L && peak === 1L && at === ts(0))
  }

  test("nested intervals and an early peak before a long tail") {
    // [0,100] with [1,2],[1,3] nested: peak 3 at t=1
    val (_, peak, at) = run(Seq((ts(0), ts(100)), (ts(1), ts(2)),
      (ts(1), ts(3))))
    assert(peak === 3L && at === ts(1))
  }

  test("session concurrency on events is bounded by the user count") {
    val sess = graft.streaming.EventStreams.sessionize(table("events"))
    val r = EventAnalytics.peakConcurrency(sess, col("session_start"),
      col("session_end")).collect()(0)
    val nUsers = table("events").select("user_id").distinct().count()
    assert(r.getLong(1) >= 1L && r.getLong(1) <= nUsers)
    assert(r.getLong(0) === sess.count())
  }
}
