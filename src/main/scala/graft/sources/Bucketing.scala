package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: the pre-shuffled join layout.
  *
  * Writing both sides of a recurring large-large join bucketed (and
  * sorted) by the join key means every subsequent join is co-located:
  * Spark matches bucket files pairwise and skips the shuffle entirely —
  * at 100 TB that converts the nightly fact-fact join from a full-network
  * exchange into a local merge per bucket. The bucket count is fixed at
  * write time; choose it so a bucket of the LARGER table fits an executor
  * core's working set (e.g. 2048-8192 buckets for multi-TB facts).
  */
object Bucketing {

  /** Persist `df` as a bucketed, per-bucket-sorted table. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(tableName)
  }

  /** Join two same-bucketed tables on their bucket column — plans with no
    * shuffle on either side when bucket counts match.
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   on: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), on)
}
