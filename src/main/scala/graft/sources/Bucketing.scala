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

  /** Persist `df` as a bucketed, per-bucket-sorted table.
    *
    * Re-runnable across JVMs: with the default in-memory catalog, a
    * previous process's managed-table FILES survive while its catalog
    * entry does not, so `mode("overwrite")` alone hits
    * LOCATION_ALREADY_EXISTS. Drop any current entry and clear the
    * managed location before writing.
    */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String,
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // Resolve and delete through the Hadoop FileSystem API so the cleanup
    // works for ANY warehouse scheme (file://, hdfs://, s3a://) and for
    // local paths with characters java.net.URI would reject.
    val loc = new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(spark.conf.get("spark.sql.warehouse.dir")),
      tableName.toLowerCase(java.util.Locale.ROOT))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true): Unit
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
