package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Long): Timestamp = new Timestamp(min * 60000L)

  private lazy val quotes = Seq(
    ("A", ts(0), 10.0),
    ("A", ts(10), 11.0),
    ("A", ts(30), 12.0),
    ("B", ts(5), 100.0)
  ).toDF("sym", "ts", "px")

  private lazy val trades = Seq(
    ("A", ts(0), 1L),   // equal ts → matches the ts(0) quote
    ("A", ts(12), 2L),  // between quotes → 11.0
    ("A", ts(45), 3L),  // after last → 12.0
    ("B", ts(4), 4L),   // before any B quote → null
    ("C", ts(9), 5L)    // key with no right rows → null
  ).toDF("sym", "ts", "qty")

  test("asOf rejects colliding or reserved column names instead of emitting duplicates") {
    // right payload sharing a left column name → ambiguous output
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades, quotes.withColumnRenamed("px", "qty"), "sym", "ts")
    }
    // reserved internal name on an input side
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades.withColumn("__side", lit(1)), quotes, "sym", "ts")
    }
    // reserved output name ts_right on the left
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(trades.withColumn("ts_right", lit(1)), quotes, "sym", "ts")
    }
  }

  test("asOf attaches the latest quote at-or-before each trade") {
    val got = AsOfJoin.asOf(trades, quotes, key = "sym", tsCol = "ts")
      .select("sym", "qty", "px").as[(String, Long, Option[Double])]
      .collect().sortBy(_._2).toSeq
    assert(got === Seq(
      ("A", 1L, Some(10.0)),
      ("A", 2L, Some(11.0)),
      ("A", 3L, Some(12.0)),
      ("B", 4L, None),
      ("C", 5L, None)))
  }

  test("asOf carries the WHOLE matched row: a null payload in the latest row stays null") {
    val right = Seq(
      ("A", ts(5), Some(1.0), Some(2.0)),
      ("A", ts(10), Some(3.0), None) // latest row: ask is NULL
    ).toDF("sym", "ts", "bid", "ask")
    val left = Seq(("A", ts(12), 1L)).toDF("sym", "ts", "qty")
    val r = AsOfJoin.asOf(left, right, "sym", "ts").collect()(0)
    assert(r.getAs[Double]("bid") === 3.0)
    assert(r.isNullAt(r.fieldIndex("ask")),
      "ask must come from the ts=10 row (null), not be stitched from ts=5")
  }

  test("asOf with tolerance drops stale matches") {
    val got = AsOfJoin.asOf(trades, quotes, key = "sym", tsCol = "ts",
        toleranceSec = Some(5 * 60))
      .select("qty", "px").as[(Long, Option[Double])].collect().sortBy(_._1).toSeq
    // trade 2 at min 12 matches quote at min 10 (2 min old, within 5) but
    // trade 3 at min 45's latest quote is 15 min old → dropped.
    assert(got === Seq(
      (1L, Some(10.0)), (2L, Some(11.0)), (3L, None), (4L, None), (5L, None)))
  }

  test("asOf equals brute force on randomized data (seeded), including ties and misses") {
    val rng = new scala.util.Random(7)
    val left = (1 to 300).map(i =>
      (rng.nextInt(12).toLong, ts(rng.nextInt(500).toLong), i.toLong))
      .toDF("k", "ts", "event_id")
    val right = (1 to 200).map(i =>
      (rng.nextInt(15).toLong, ts(rng.nextInt(500).toLong), (1000 + i).toLong))
      .toDF("k", "ts", "view_id")

    val got = AsOfJoin.asOf(left, right, "k", "ts")
      .select(col("event_id"), col("ts_right")).as[(Long, Option[Timestamp])]
      .collect().toMap
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id"))
      .agg(max(col("r.ts")).as("m"))
      .as[(Long, Option[Timestamp])].collect().toMap
    assert(got.keySet === brute.keySet)
    // the matched timestamp (unique per key) must agree exactly everywhere
    brute.foreach { case (id, m) => assert(got(id) === m, s"event $id") }
  }

  test("asOf equals the brute-force range join on real events data") {
    // GraftSession.events normalizes whatever physical ts encoding the
    // current testdata generation ships (nanos Long / NTZ / TIMESTAMP).
    val events = graft.GraftSession.events(spark, Sf)
    val left = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("k"), col("ts"), col("event_id"))
    val right = events.filter(col("event_type") === "view")
      .select(col("user_id").as("k"), col("ts"), col("event_id").as("view_id"))

    val gotAsOf = AsOfJoin.asOf(left, right, "k", "ts")
      .select(col("event_id"), col("view_id")).as[(Long, Option[Long])]
      .collect().toMap
    val brute = left.as("l").join(right.as("r"),
        col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
      .groupBy(col("l.event_id"))
      .agg(max_by(col("r.view_id"), col("r.ts")).as("view_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(gotAsOf.keySet === brute.keySet)
    // where the brute force found a match, as-of must agree on SOME match
    // with the same timestamp; ids can differ only on exact-ts ties.
    brute.foreach { case (id, v) =>
      assert(gotAsOf(id).isDefined === v.isDefined, s"event $id")
    }
  }
}
