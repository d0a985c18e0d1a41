package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSON-Lines corpus interchange — the de-facto format training corpora
  * ship in (one JSON object per line, usually gzipped into *.jsonl.gz
  * shards).
  *
  * Reading ALWAYS takes an explicit schema: at 100 TB, schema inference
  * is a full extra pass over the corpus AND a correctness hazard (a
  * shard where every value of a column happens to be numeric infers a
  * different type than its neighbors). Codec handling is Spark-native:
  * compressed shards decode transparently on read, with splittability
  * governed by the codec (gzip shards are per-file parallel — shard
  * sizing, not in-file splitting, is the parallelism knob; a production
  * lake re-shards to ~256 MB files via [[Compaction]]).
  */
object Jsonl {

  /** Write `df` as gzipped JSONL shards (one per partition). */
  def write(df: DataFrame, dir: String, compression: String = "gzip"): Unit =
    df.write.mode("overwrite").option("compression", compression).json(dir)

  /** Read a JSONL directory under an EXPLICIT schema; rows that fail to
    * parse surface as all-null rows under the default PERMISSIVE mode —
    * pass `mode=FAILFAST` to make corruption loud instead.
    */
  def read(spark: SparkSession, dir: String, schema: StructType,
           mode: String = "PERMISSIVE"): DataFrame =
    spark.read.schema(schema).option("mode", mode).json(dir)
}
