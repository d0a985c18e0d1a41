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

  /** (id, simhash) per document — expression-string form (nested lambdas
    * with bit shifts read better in SQL than through the Scala DSL).
    */
  def signatures(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("sh_id"), MinHashLsh.tokens(text).as("toks"))
      .withColumn("tok_hashes", expr("transform(toks, t -> xxhash64(t))"))
      .withColumn("tallies", expr(
        """aggregate(
          |  tok_hashes,
          |  array_repeat(0L, 64),
          |  (acc, h) -> zip_with(
          |    acc,
          |    transform(sequence(0, 63),
          |      i -> CASE WHEN (shiftright(h, i) & 1) = 1 THEN 1L ELSE -1L END),
          |    (a, b) -> a + b))""".stripMargin))
      .withColumn("simhash", expr(
        """aggregate(
          |  zip_with(
          |    tallies,
          |    transform(sequence(0, 63), i -> shiftleft(1L, i)),
          |    (tally, bit) -> CASE WHEN tally > 0 THEN bit ELSE 0L END),
          |  0L, (acc, b) -> acc | b)""".stripMargin))
      .select("sh_id", "simhash")

  /** Exact near-duplicate pairs within Hamming distance maxDist (≤ 3 for
    * the default 4-band split to stay lossless).
    */
  def nearDuplicates(docs: DataFrame, id: Column, text: Column, maxDist: Int = 3): DataFrame = {
    require(maxDist <= 3, "4 bands of 16 bits are only lossless up to Hamming distance 3")
    val sigs = signatures(docs, id, text)
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
