package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Scalar-quantized (SQ8) nearest-neighbor search — the int8 member of the
  * quantization family (PQ/OPQ/IVFPQ compress with fitted codebooks; SQ8
  * compresses with a FIXED per-element grid). Each float becomes one byte
  * (⌊x·2^bits⌋ clamped to [-128, 127]), a 4× storage cut, and the scoring
  * loop is pure integer add/sub/mul — no fitted model, no FP, no
  * tie-break ambiguity: with exact integer distances the whole shortlist
  * is deterministic and an out-of-engine replay recomputes every distance
  * bit-for-bit (unlike the fitted-codebook variants, which certify via
  * planted recovery).
  *
  * Scale shape mirrors [[Knn.bruteForceTopK]]: queries broadcast, corpus
  * scanned once with no corpus shuffle, codes materialized ONCE per side
  * before the join (the storage story: a production table persists the
  * code column and never re-reads the floats), per-pair work one codegen'd
  * integer loop ([[graft.functions.Sq8DistL2]]), ranking in a per-query
  * window. At 100 TB the same plan serves as the IVF rescoring pass:
  * cell-restricted candidates × SQ8 distance.
  */
object SqKnn {

  /** Exact top-k under SQ8 quantized L2: (query_id, rnk, neighbor_id,
    * dist). `queries` must be broadcast-sized. Distances are exact
    * integers; ties break on neighbor_id, so the result is fully
    * deterministic.
    */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           scaleBits: Int = 6): DataFrame =
    topKCodes(
      corpus.select(col("vec_id"), VecOps.sq8F(col("embedding"), scaleBits).as("code")),
      queries, k, scaleBits)

  /** Search a pre-quantized code table — the serving path once the codes
    * persist ([[graft.sources.IndexIO.saveSq8]]): the floats never load
    * again; queries quantize on the fly AT THE TABLE'S OWN scale.
    * `codes` carries (vec_id, code: array<byte>).
    */
  def topKCodes(codes: DataFrame, queries: DataFrame, k: Int,
                scaleBits: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"),
      VecOps.sq8F(col("embedding"), scaleBits).as("q_code")))
    codes.join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        VecOps.sq8DistL2(col("q_code"), col("code")).as("dist"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("dist"), col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id", "dist")
      .orderBy("query_id", "rnk")
  }
}
