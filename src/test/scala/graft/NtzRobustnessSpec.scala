package graft

import java.sql.Timestamp
import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}

import graft.analytics.{EventAnalytics, Relational}
import graft.operators.AsOfJoin
import graft.streaming.EventStreams

/** Event-time operators must analyze and agree on BOTH physical timestamp
  * encodings parquet can ship: `TIMESTAMP` (isAdjustedToUTC=true) and
  * `TIMESTAMP_NTZ` (false). A driver testdata regeneration flipped the
  * events table from nanos to NTZ between rounds and every bare
  * `unix_micros(ts)` failed analysis; this suite pins the fix — if anyone
  * reintroduces a bare `unix_micros` on an event-time column, the NTZ leg
  * here throws AnalysisException again.
  *
  * The two fixtures carry the SAME instants: the session zone is pinned
  * UTC, so a wall-clock LocalDateTime at offset UTC and a Timestamp of
  * the same epoch millis are one logical event log in two encodings.
  */
class NtzRobustnessSpec extends SparkSpec {
  import spark.implicits._

  // (event_id, user_id, event_type, minutes-since-epoch)
  private val rows = Seq(
    (1L, 1L, "signup", 0L), (2L, 1L, "view", 10L), (3L, 1L, "click", 40L),
    (4L, 1L, "purchase", 45L), (5L, 1L, "view", 200L),
    (6L, 2L, "view", 5L), (7L, 2L, "signup", 7L), (8L, 2L, "view", 9L),
    (9L, 2L, "click", 300L), (10L, 2L, "purchase", 301L),
    (11L, 3L, "signup", 50L), (12L, 3L, "purchase", 49L) // purchase BEFORE signup
  )

  private def ntzTs(min: Long): LocalDateTime =
    LocalDateTime.ofEpochSecond(min * 60L, 0, ZoneOffset.UTC)
  private def ltzTs(min: Long): Timestamp = new Timestamp(min * 60000L)

  private lazy val ntz: DataFrame = rows
    .map { case (id, u, et, m) => (id, ntzTs(m), u, et) }
    .toDF("event_id", "ts", "user_id", "event_type")
  private lazy val ltz: DataFrame = rows
    .map { case (id, u, et, m) => (id, ltzTs(m), u, et) }
    .toDF("event_id", "ts", "user_id", "event_type")

  test("fixtures really carry the two distinct encodings") {
    assert(ntz.schema("ts").dataType === TimestampNTZType)
    assert(ltz.schema("ts").dataType === TimestampType)
  }

  test("epochMicros yields identical integers on both encodings") {
    def us(df: DataFrame): Seq[(Long, Long)] = df
      .select(col("event_id"), Relational.epochMicros(col("ts")).as("us"))
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    val got = us(ntz)
    assert(got === us(ltz))
    assert(got.head === ((1L, 0L)))
    assert(got(1) === ((2L, 10L * 60L * 1000000L)))
  }

  test("sessionize (lag form) analyzes and agrees across encodings") {
    def sess(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
      EventStreams.sessionize(df, gapSec = 1800L)
        .select(col("user_id"), col("session_seq"),
          Relational.epochMicros(col("session_start")).as("s"),
          Relational.epochMicros(col("session_end")).as("e"), col("n_events"))
        .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val got = sess(ntz)
    assert(got === sess(ltz))
    // user 1: events at 0/10/40/45 chain within the 30-min gap; 200 breaks
    assert(got.filter(_._1 == 1L).map(r => (r._2, r._5)) === Seq((1L, 4L), (2L, 1L)))
  }

  test("funnel analyzes and agrees across encodings") {
    val steps = Seq("signup", "view", "click", "purchase")
    def fun(df: DataFrame): Seq[(Int, String, Long)] =
      EventAnalytics.funnel(df, col("user_id"), col("ts"), col("event_type"), steps)
        .as[(Int, String, Long)].collect().toSeq
    val got = fun(ntz)
    assert(got === fun(ltz))
    // users 1 and 2 complete all four steps in order; user 3's purchase
    // precedes signup so their funnel stops at step 1.
    assert(got.map(_._3) === Seq(3L, 2L, 2L, 2L))
  }

  test("asOf with tolerance analyzes and agrees across encodings") {
    def split(df: DataFrame): (DataFrame, DataFrame) = (
      df.filter(col("event_type") === "purchase")
        .select(col("user_id").as("k"), col("ts"), col("event_id")),
      df.filter(col("event_type") === "view")
        .select(col("user_id").as("k"), col("ts"), col("event_id").as("view_id")))
    def run(df: DataFrame): Seq[(Long, Option[Long])] = {
      val (l, r) = split(df)
      AsOfJoin.asOf(l, r, "k", "ts", toleranceSec = Some(3600L))
        .select(col("event_id"), col("view_id")).as[(Long, Option[Long])]
        .collect().sortBy(_._1).toSeq
    }
    val got = run(ntz)
    assert(got === run(ltz))
    // user 1's purchase at min 45 sees the view at min 10 (35 min old,
    // within tolerance); user 2's at 301 sees min 9 → stale, dropped;
    // user 3 has no views.
    assert(got === Seq((4L, Some(2L)), (10L, None), (12L, None)))
  }

  test("GraftSession.events normalizes the real table to TIMESTAMP") {
    val ev = GraftSession.events(spark, Sf)
    assert(ev.schema("ts").dataType === TimestampType)
    assert(ev.limit(1).count() === 1L)
  }
}
