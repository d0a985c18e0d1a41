package graft.etl

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Compaction

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("inferSchema merges fields across the whole sample, not just the first row") {
    val df = Seq(
      """{"a": 1}""",
      """{"a": 2, "b": "x"}""",
      """{"a": 3, "c": [1, 2]}"""
    ).toDF("j")
    val ddl = JsonExtract.inferSchema(df, col("j"))
    assert(ddl.contains("a") && ddl.contains("b") && ddl.contains("c"),
      s"fields absent from the first row must still be inferred: $ddl")
    // the inferred schema round-trips through parsed()
    val parsed = JsonExtract.parsed(df, col("j"), ddl)
    assert(parsed.select(col("props_struct.b")).filter(col("b").isNotNull).count() === 1L)
  }

  test("observed metrics count rows, nulls, and violations in one pass") {
    val df = Seq(
      (1L, Some(10.0)), (2L, None), (3L, Some(-5.0)), (4L, Some(2.0))
    ).toDF("id", "v")
    val (observed, obs) = Observability.observed(df, "stage1",
      nullChecked = Seq("v"),
      violations = Map("negative_v" -> (col("v") < 0)))
    observed.write.format("noop").mode("overwrite").save()
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("nulls_v") === 1L)
    assert(m("negative_v") === 1L)
  }

  test("SnapshotDiff classifies added/removed/changed/unchanged exactly") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "t")
    val nw = Seq((2L, "b"), (3L, "C2"), (4L, "d"), (5L, "e")).toDF("id", "t")
    val classes = SnapshotDiff.classify(old, nw, col("id"), xxhash64(col("t")))
      .as[(Long, String)].collect().toMap
    assert(classes === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "unchanged", 5L -> "added"))
    val counts = SnapshotDiff.diffCounts(old, nw, col("id"), xxhash64(col("t")))
      .as[(String, Long)].collect().toList
    assert(counts === List(("added", 1L), ("changed", 1L),
      ("removed", 1L), ("unchanged", 2L)))
  }

  test("applyDelta: upserts win, deletes drop, untouched rows carry over") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "t")
    val ups = Seq((2L, "B2"), (4L, "d")).toDF("id", "t")
    val dels = Seq(Tuple1(3L)).toDF("id")
    val merged = SnapshotDiff.applyDelta(snap, ups, dels, col("id"))
      .as[(Long, String)].collect().toSet
    assert(merged === Set((1L, "a"), (2L, "B2"), (4L, "d")))
    // merge then re-diff: applying a snapshot's own diff reproduces it
    val classes = SnapshotDiff.classify(snap, merged.toSeq.toDF("id", "t"),
      col("id"), xxhash64(col("t"))).as[(Long, String)].collect().toMap
    assert(classes === Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "added"))
  }

  test("collapseCdc keeps the max version per id regardless of arrival order") {
    val delta = Seq((1L, 2L, "v2"), (2L, 1L, "only"), (1L, 1L, "v1"),
      (1L, 3L, "v3")).toDF("id", "ver", "t")
    val got = SnapshotDiff.collapseCdc(delta, "id", "ver")
      .select("id", "ver", "t").as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 3L, "v3"), (2L, 1L, "only")))
  }

  test("applyCdc: version order resolves tombstones before the merge") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "t")
    val delta = Seq(
      (2L, 1L, "u", "b1"), (2L, 2L, "u", "b2"),   // out-of-order upserts → b2
      (3L, 2L, "d", "x"),  (3L, 1L, "u", "c1"),   // late delete wins → 3 dropped
      (4L, 1L, "d", "x"),  (4L, 2L, "u", "d2"),   // early delete loses → d2
      (5L, 1L, "d", "x")                           // tombstone for absent id: no-op
    ).toDF("id", "ver", "op", "t")
    val merged = SnapshotDiff.applyCdc(snap, delta, "id", "ver", "op")
      .as[(Long, String)].collect().toSet
    assert(merged === Set((1L, "a"), (2L, "b2"), (4L, "d2")))
  }

  test("profile: one-scan column counters with nulls excluded from NDV") {
    val df = Seq((1L, Some("a")), (2L, None), (3L, Some("a")), (4L, Some("b")))
      .toDF("id", "s")
    val got = graft.etl.Observability.profile(df, Seq("id", "s"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("id", 4L, 0L, 4L), ("s", 4L, 1L, 2L)))
  }

  test("scd2History: half-open validity chain, one current row, arrival-order-proof") {
    import java.sql.Timestamp
    def ts(d: Int) = new Timestamp(d * 86400000L)
    // key 1: three versions listed out of order; key 2: a single version
    val events = Seq((1L, 3L, ts(3)), (1L, 1L, ts(1)), (2L, 1L, ts(5)),
      (1L, 2L, ts(2))).toDF("id", "ver", "eff_ts")
    val got = SnapshotDiff.scd2History(events, "id", "eff_ts", "ver")
      .select("id", "ver", "valid_from", "valid_to", "is_current")
      .as[(Long, Long, Timestamp, Option[Timestamp], Boolean)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    assert(got === Seq(
      (1L, 1L, ts(1), Some(ts(2)), false),
      (1L, 2L, ts(2), Some(ts(3)), false),
      (1L, 3L, ts(3), None, true),
      (2L, 1L, ts(5), None, true)))
    // exactly one current row per key; intervals chain with no gaps
    assert(got.filter(_._5).map(_._1).toSet === Set(1L, 2L))
  }

  test("driftTable: exact TV fractions; a planted shift flips the drift flag") {
    // old: source A uniform over buckets 0/1; new: all mass moved to 1
    val old = Seq(("A", 0L), ("A", 0L), ("A", 1L), ("A", 1L),
      ("B", 0L), ("B", 1L)).toDF("source", "b")
    val nw = Seq(("A", 1L), ("A", 1L), ("A", 1L), ("A", 1L),
      ("B", 0L), ("B", 1L)).toDF("source", "b")
    val got = SnapshotDiff.driftTable(old, nw, col("source"), col("b"))
      .as[(String, Long, Long, Long, Long, Boolean)].collect().toList
    // A: cells (b0: 2→0, b1: 2→4), t=4/4: tv_num = |0·4−2·4| + |4·4−2·4| = 16,
    // tv_den = 32 → TV = 0.5 > 5% ⇒ drift. B unchanged ⇒ TV 0.
    assert(got === List(("A", 4L, 4L, 16L, 32L, true),
      ("B", 2L, 2L, 0L, 8L, false)))
  }

  test("compact rewrites a fragmented directory into few files, preserving rows") {
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    spark.range(0, 20000).toDF("id")
      .repartition(64) // fragment: 64 tiny files
      .write.parquet(dir)
    assert(Compaction.dataFiles(dir) === 64)
    val before = spark.read.parquet(dir).agg(sum("id")).as[Long].head()

    val n = Compaction.compact(spark, dir, targetBytes = 1L * 1024 * 1024)
    assert(Compaction.dataFiles(dir) === n)
    assert(n < 8, s"still $n files")
    assert(spark.read.parquet(dir).agg(sum("id")).as[Long].head() === before)
    assert(spark.read.parquet(dir).count() === 20000L)
  }

  test("q_compaction's files_after=1 oracle pin holds with margin at the largest benched sf") {
    // ADVICE r14: the q_compaction oracle restates files_after = 1 on the
    // measured fact that the 3-column lineitem projection compresses under
    // one 64 MB target. Guard that fact HERE, at the largest sf the driver
    // benches (sf0.1) and with 2x margin, so a future sf bump or codec
    // change fails this spec with a clear message instead of surfacing as
    // an opaque oracle hash mismatch.
    val dir = Files.createTempDirectory("graft_compact_margin").toString + "/t"
    graft.GraftSession.table(spark, "/root/testdata/sf0.1", "lineitem")
      .select("l_orderkey", "l_quantity", "l_extendedprice")
      .repartition(200).write.parquet(dir)
    val bytes = Compaction.dataBytes(dir)
    assert(bytes < 32L * 1024 * 1024,
      s"the fragmented 3-column lineitem projection is $bytes bytes at sf0.1 " +
        "-- within 2x of the 64 MB compaction target. q_compaction's oracle " +
        "pins files_after = 1; re-measure and update the pin (SparkEntry " +
        "q_compaction + SURVEY ledger) before benching a larger sf.")
  }
}
