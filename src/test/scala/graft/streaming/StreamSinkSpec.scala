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
}
