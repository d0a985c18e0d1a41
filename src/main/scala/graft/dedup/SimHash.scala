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
    * the default 4-band split to stay lossless). The band self-join runs
    * through [[graft.operators.SkewJoin.boundedSelfPairs]] so a hot band
    * value (every near-identical boilerplate doc shares one) cannot
    * concentrate quadratic pair work in a single task.
    */
  def nearDuplicates(docs: DataFrame, id: Column, text: Column, maxDist: Int = 3,
                     hotBandThreshold: Int = 4096): DataFrame = {
    // Materialization boundary: boundedSelfPairs scans the banded frame
    // five times — persist so the O(tokens × 64) signature runs once per
    // document (see MinHashLsh.candidatePairs).
    val sigs = graft.CachePool.persist(signatures(docs, id, text))
    pairsFromSignatures(sigs, maxDist, hotBandThreshold)
  }

  /** Signature-agnostic half of [[nearDuplicates]]: exact pairs within
    * Hamming distance `maxDist` over ANY (sh_id, simhash) 64-bit
    * signature frame — text SimHash here, perceptual image dHash in
    * [[graft.multimodal.Multimodal.imageNearDuplicates]], any other
    * 64-bit sketch the same way. 4 × 16-bit bands: by pigeonhole any
    * pair within distance 3 shares an exact band, so the equi-join is
    * lossless up to 3 and the `bit_count(xor)` filter makes it exact.
    */
  def pairsFromSignatures(sigs: DataFrame, maxDist: Int = 3,
                          hotBandThreshold: Int = 4096): DataFrame = {
    require(maxDist <= 3, "4 bands of 16 bits are only lossless up to Hamming distance 3")
    val banded = sigs.select(
      col("sh_id"), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftrightunsigned(col("simhash"), b * 16).bitwiseAND(lit(0xFFFFL))): _*)))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_val")
    graft.operators.SkewJoin
      .boundedSelfPairs(banded, Seq("band", "band_val"), col("sh_id"), col("simhash"),
        hotBandThreshold)
      .select(col("id_a"), col("id_b"),
        bit_count(col("pay_a").bitwiseXOR(col("pay_b"))).as("hamming"))
      .groupBy("id_a", "id_b")
      .agg(min("hamming").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy("id_a", "id_b")
  }
}
