package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.util.LongAccumulator

import graft.SparkSpec

class StreamSinkSpec extends SparkSpec {
  import spark.implicits._

  test("toExternalBatched drains micro-batches through executor-side batches") {
    val rowsAcc = new LongAccumulator
    val oversize = new LongAccumulator
    spark.sparkContext.register(rowsAcc, "s_rows")
    spark.sparkContext.register(oversize, "s_oversize")

    val input = MemoryStream[Long](spark)
    input.addData(1L to 507L: _*)
    val q = StreamSink.toExternalBatched(input.toDF(), batchSize = 50) { (_, rows) =>
      rowsAcc.add(rows.size.toLong)
      if (rows.size > 50) oversize.add(1L)
    }.start()
    try q.processAllAvailable() finally q.stop()
    assert(rowsAcc.value === 507L)
    assert(oversize.value === 0L)
  }

  test("toParquet appends micro-batches exactly once") {
    val out = Files.createTempDirectory("graft_ssink").toString
    val cp = Files.createTempDirectory("graft_scp").toString
    val input = MemoryStream[Long](spark)
    input.addData(1L to 100L: _*)
    val q = StreamSink.toParquet(input.toDF(), out, cp)
    try {
      q.processAllAvailable()
      input.addData(101L to 150L: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.read.parquet(out).count() === 150L)
  }

  test("stateful aggregation RESUMES from checkpoint: state, offsets and sink all survive") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types._
    // file source (replayable, unlike MemoryStream) → watermarked window
    // agg → file sink, stopped and RESTARTED between event batches. The
    // restart must (a) not re-read batch-1 files (offsets), (b) keep the
    // hour-0 window's partial count so a batch-2 event accumulates into
    // it (state store), and (c) emit each finalized window exactly once
    // (file-sink commit log).
    val src = Files.createTempDirectory("graft_ckpt_src").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val cp = Files.createTempDirectory("graft_ckpt_cp").toString
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    // hour-aligned base well past epoch (watermark starts at 1970)
    val h0 = 1704067200000L // 2024-01-01T00:00:00Z
    def ts(min: Long) = new Timestamp(h0 + min * 60000L)
    def writeBatch(name: String, rows: Seq[(Timestamp, Double)]): Unit =
      rows.toDF("ts", "value").coalesce(1).write.parquet(s"$src/$name")
    def run(): Unit = {
      val q = EventStreams.tumblingCountsStream(
          spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet")
            .option("recursiveFileLookup", "true").parquet(src))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", cp)
        .outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    writeBatch("b1", Seq((ts(0), 1.0), (ts(10), 2.0), (ts(70), 4.0)))
    run() // first life: hour-0 and hour-1 windows open, nothing final
    // second life: hour-0 gains a third event ACROSS the restart, and
    // two sentinel hours push the watermark past both real windows
    writeBatch("b2", Seq((ts(50), 8.0)))
    run()
    writeBatch("b3", Seq((ts(60 * 24), 0.0)))
    run()
    writeBatch("b4", Seq((ts(60 * 25), 0.0)))
    run()
    val got = spark.read.parquet(out)
      .filter(col("window_start") <= ts(70))
      .select("window_start", "n_events", "sum_value_mu")
      .as[(Timestamp, Long, Long)].collect()
      .map(r => ((r._1.getTime - h0) / 60000L, r._2, r._3)).toSet
    // hour 0: 1+2+8 across TWO lives; hour 1: the single event. Each
    // exactly once — a replayed batch would double hour 0's count.
    assert(got === Set((0L, 3L, 11000000L), (60L, 1L, 4000000L)))
  }
}
