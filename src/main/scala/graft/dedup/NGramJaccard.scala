package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact word-n-gram Jaccard similarity over candidate pairs.
  *
  * Exact set Jaccard is O(pairs × shingles) — never run it all-pairs at
  * scale. Candidates come from a cheap blocking stage (a blocking column
  * here; MinHash/SimHash LSH in the general case), then the exact score
  * confirms. The blocked self-join is an equi-join on the block key:
  * shuffle-partitionable, AQE-skew-handled.
  */
object NGramJaccard {

  /** Distinct word n-gram set of a text column. */
  def ngramSet(text: Column, n: Int): Column =
    array_distinct(MinHashLsh.shingles(MinHashLsh.tokens(text), n))

  /** |A ∩ B| / |A ∪ B| over two array columns (exact, integer-derived). */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") / size(array_union(a, b))

  /** Exact Jaccard for every intra-block pair (idA < idB) with similarity
    * ≥ threshold.
    */
  def blockedPairs(docs: DataFrame, id: Column, text: Column, block: Column,
                   n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sets = docs.select(block.as("blk"), id.as("nj_id"), ngramSet(text, n).as("grams"))
    val a = sets.select(col("blk"), col("nj_id").as("id_a"), col("grams").as("grams_a"))
    val b = sets.select(col("blk"), col("nj_id").as("id_b"), col("grams").as("grams_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), jaccard(col("grams_a"), col("grams_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .groupBy("id_a", "id_b")
      .agg(max("jaccard").as("jaccard"))
      .orderBy("id_a", "id_b")
  }
}
