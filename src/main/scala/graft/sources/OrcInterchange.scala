package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** ORC interchange — the columnar sibling of [[Jsonl]] for pipelines
  * whose upstream (Hive-era lakes, Trino/Presto exports) speaks ORC
  * rather than parquet. Spark's ORC datasource is built in; like every
  * graft source the read takes an EXPLICIT schema (inference at 100 TB
  * is an extra pass and a type hazard) and predicate pushdown / column
  * pruning work exactly as on parquet (ORC carries stripe-level min-max
  * stats, so the same partition- and file-skipping story applies).
  */
object OrcInterchange {

  /** Write `df` as ORC, zlib-compressed (the ORC default ecosystem
    * readers expect; snappy/zstd via `compression`).
    */
  def write(df: DataFrame, path: String, compression: String = "zlib"): Unit =
    df.write.mode("overwrite").option("compression", compression).orc(path)

  /** Read ORC under an explicit schema. */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
