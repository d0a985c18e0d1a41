package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}

import graft.sources.BatchSink

/** Streaming write path: `readStream → transforms → writeStream`, with the
  * external-sink micro-batches drained through the same executor-side
  * batched writer the batch path uses (`BatchSink.foreachBatched`) — the
  * streaming equivalent of the reference's ClickHouse load, without its
  * driver-side collect.
  */
object StreamSink {

  /** Send every micro-batch to an external sink in `batchSize`-row groups
    * per partition. `send` runs on executors; `epochId` is passed through
    * so idempotent sinks can dedup replayed batches after recovery.
    */
  def toExternalBatched(df: DataFrame, batchSize: Int = 2000,
                        trigger: Trigger = Trigger.AvailableNow())(
      send: (Long, Seq[Row]) => Unit): DataStreamWriter[Row] =
    df.writeStream
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        BatchSink.foreachBatched(batch, batchSize)(rows => send(epochId, rows))
      }

  /** Append micro-batches as partitioned parquet (exactly-once via the
    * streaming file-sink commit log).
    */
  def toParquet(df: DataFrame, path: String, checkpoint: String,
                partitionCols: Seq[String] = Nil): StreamingQuery = {
    val w = df.writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w).start()
  }
}
