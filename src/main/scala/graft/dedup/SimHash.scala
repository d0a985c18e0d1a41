package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash near-duplicate detection.
  *
  * Signature: per token-hash, each of the 64 bits votes +1/-1; the sign of
  * the per-bit tally is the signature bit. Computed as one nested
  * higher-order expression per document — no shuffle, no UDF.
  *
  * Candidate generation: split the 64-bit signature into 4 16-bit bands; by
  * pigeonhole, any pair within Hamming distance 3 shares at least one exact
  * band, so the band equi-join finds all such pairs; the final
  * `bit_count(xor) ≤ maxDist` check makes it exact.
  */
object SimHash {

  /** (id, simhash) per document: hash tokens once, then one native
    * O(tokens × 64) tally loop (graft.functions.SimHash64).
    */
  def signatures(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("sh_id"),
      graft.functions.TextHashExprs.simhash64(
        transform(MinHashLsh.tokens(text), t => xxhash64(t))).as("simhash"))

  /** Exact near-duplicate pairs within Hamming distance maxDist (≤ 3 for
    * the default 4-band split to stay lossless).
    */
  def nearDuplicates(docs: DataFrame, id: Column, text: Column, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4 bands of 16 bits are only lossless up to Hamming distance 3")
    // Materialization boundary: the O(tokens × 64) signature expression
    // feeds both self-join sides and 4 band projections — persist so it
    // runs once per document (see MinHashLsh.candidatePairs).
    val sigs = signatures(docs, id, text)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded = sigs.select(
      col("sh_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    val a = banded.select(col("band"), col("band_val"), col("sh_id").as("id_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_val"), col("sh_id").as("id_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy("id_a", "id_b")
  }
}
