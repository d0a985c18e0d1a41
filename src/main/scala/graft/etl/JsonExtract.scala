package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Typed extraction from JSON string columns (semi-structured payloads —
  * event properties, API blobs, crawl metadata).
  *
  * `from_json` with an EXPLICIT schema is the scale path: single parse per
  * row into an unsafe struct, columns prune through it, malformed rows go
  * null instead of failing the job (PERMISSIVE). Schema inference
  * (`schema_of_json` over a sample) is exposed separately because it costs
  * an extra pass — infer once, then pin the schema in code.
  */
object JsonExtract {

  /** Parse `jsonCol` into a struct column named `as` using a DDL schema
    * string (e.g. "k INT, tags ARRAY<STRING>").
    */
  def parsed(df: DataFrame, jsonCol: Column, ddl: String, as: String = "props_struct"): DataFrame =
    df.withColumn(as, from_json(jsonCol, StructType.fromDDL(ddl)))

  /** Infer the JSON schema from a sample — one extra job; use only
    * interactively, then pin the result.
    *
    * Inference runs over EVERY sampled row (Spark's JSON reader merges the
    * per-row schemas), so a field absent from the first row still appears
    * in the result — `schema_of_json` on a single row would silently drop
    * it.
    */
  def inferSchema(df: DataFrame, jsonCol: Column, sample: Int = 1000): String = {
    val spark = df.sparkSession
    import spark.implicits._
    val sampled = df.select(jsonCol.cast("string").as("j"))
      .filter(col("j").isNotNull).limit(sample).as[String]
    // DROPMALFORMED: a corrupt row in the sample must not inject a
    // _corrupt_record column into the inferred schema.
    spark.read.option("mode", "DROPMALFORMED").json(sampled).schema.toDDL
  }
}
