package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** INCREMENTAL drift monitoring — the streaming face of
  * [[graft.etl.SnapshotDiff.driftTable]]: a static baseline histogram
  * (bounded: sources × buckets rows, collected once like the ANN sample
  * fits) rides inside the stateful operator, per-source bucket counts
  * accumulate across micro-batches, and every trigger re-emits the
  * source's current total-variation row — the SAME exact integer
  * fraction as the batch operator, so when the stream drains the last
  * emission per source equals `driftTable`'s row bit-for-bit
  * (parity-spec'd).
  *
  * State per source is one count per observed bucket — bounded by the
  * bucket-feature's cardinality, not the stream. No timeout: drift
  * monitoring is a long-lived gauge; evict idle sources at the caller
  * with a TTL variant if sources churn.
  */
object DriftMonitor {

  case class DriftRow(source: String, t_old: Long, t_new: Long,
                      tv_num: Long, tv_den: Long, drift: Boolean)

  /** `rows` is the streaming (source, bucket) projection of arriving
    * docs; `baseline` the full old-snapshot histogram keyed
    * (source, bucket). Update-mode changelog of per-source TV rows.
    */
  def driftStream(rows: Dataset[(String, Long)],
                  baseline: Map[(String, Long), Long]): Dataset[DriftRow] = {
    import rows.sparkSession.implicits._
    val baseBySource: Map[String, Map[Long, Long]] =
      baseline.groupBy(_._1._1).map { case (s, m) =>
        s -> m.map { case ((_, b), c) => b -> c }
      }

    def update(source: String, batch: Iterator[(String, Long)],
               state: GroupState[Map[Long, Long]]): Iterator[DriftRow] = {
      val counts = batch.foldLeft(state.getOption.getOrElse(Map.empty)) {
        case (m, (_, b)) => m.updated(b, m.getOrElse(b, 0L) + 1L)
      }
      state.update(counts)
      val old = baseBySource.getOrElse(source, Map.empty)
      val tOld = old.values.sum
      val tNew = counts.values.sum
      val tvNum = (old.keySet ++ counts.keySet).toSeq.map { b =>
        math.abs(counts.getOrElse(b, 0L) * tOld - old.getOrElse(b, 0L) * tNew)
      }.sum
      val tvDen = 2L * tOld * tNew
      Iterator.single(
        DriftRow(source, tOld, tNew, tvNum, tvDen, tvNum * 20L > tvDen))
    }

    rows.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update,
        GroupStateTimeout.NoTimeout)(update)
  }
}
