package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs

/** Exact word-n-gram Jaccard similarity over candidate pairs.
  *
  * Exact set Jaccard is O(pairs × shingles) — never run it all-pairs at
  * scale. Candidates come from a cheap blocking stage (a blocking column
  * here; MinHash/SimHash LSH in the general case), then the exact score
  * confirms. The blocked self-join is an equi-join on the block key:
  * shuffle-partitionable, AQE-skew-handled.
  *
  * Scale/CPU design: gram sets are 64-bit hashes (long arrays), not
  * strings — set intersection compares 8-byte values instead of hashing
  * variable-length strings, and the shuffled candidate rows carry ~8 bytes
  * per gram. A size prefilter (J(A,B) ≤ min|A|,|B| / max|A|,|B|) discards
  * most pairs before any set operation runs.
  */
object NGramJaccard {

  /** Distinct word n-gram set of a text column, as SORTED 64-bit gram
    * hashes (rolling window-poly over per-token hashes — O(tokens), see
    * MinHashLsh.shingleHashes; sorted so pair intersection is a linear
    * merge).
    */
  def ngramSet(text: Column, n: Int): Column =
    array_sort(MinHashLsh.shingleHashes(text, n))

  /** |A ∩ B| / |A ∪ B| over two sorted long-array columns: one native
    * merge-count per evaluation, |A ∪ B| derived as |A| + |B| − |A ∩ B|.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = TextHashExprs.sortedIntersectCount(a, b)
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Containment C(A→B) = |A ∩ B| / |A|: catches near-SUPERSET duplicates
    * (a doc quoting most of another) that symmetric Jaccard misses —
    * J(A,B) is small when |B| ≫ |A| even if A ⊂ B.
    */
  def containment(a: Column, b: Column): Column =
    TextHashExprs.sortedIntersectCount(a, b).cast("double") / size(a)

  /** The shared INVERTED-INDEX pair core: (id_a, id_b, n_shared, n_a, n_b)
    * for every intra-block pair sharing ≥1 gram.
    *
    * Each document explodes its distinct gram hashes once; a pair
    * materializes only for grams two documents actually share (equi-join
    * on the 8-byte gram hash within the block, routed through
    * [[graft.operators.SkewJoin.boundedSelfPairs]] so a stop-gram shared
    * by thousands of documents cannot concentrate its quadratic pair work
    * in one task), and |A ∩ B| falls out of a count aggregation per pair —
    * the same linear, shuffle-partitionable shape as
    * [[graft.text.Fingerprint.sharedRunPairs]]. Non-overlapping pairs are
    * never formed at all, which beats any size-banding prefilter.
    */
  private def gramPairCounts(docs: DataFrame, id: Column, text: Column, block: Column,
                             n: Int, hotGramThreshold: Int): DataFrame = {
    // persist: the exploded gram index feeds the key histogram and both
    // sides of the self-join; without the boundary the tokenize→hash
    // pipeline re-runs per consumer.
    val grams = graft.CachePool.persist(
      docs.select(block.as("blk"), id.as("nj_id"), ngramSet(text, n).as("grams"))
        .select(col("blk"), col("nj_id"), size(col("grams")).as("n_g"),
          explode(col("grams")).as("g")))
    graft.operators.SkewJoin
      .boundedSelfPairs(grams, Seq("blk", "g"), col("nj_id"), col("n_g"), hotGramThreshold)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"), first("pay_a").as("n_a"), first("pay_b").as("n_b"))
  }

  /** Intra-block pairs where either direction's containment ≥ threshold
    * (idA < idB; both directions reported). Result values are identical to
    * the all-pairs sorted-merge form — `count(shared grams) / |A|` is the
    * same integer-over-integer division.
    */
  def containmentPairs(docs: DataFrame, id: Column, text: Column, block: Column,
                       n: Int = 3, threshold: Double = 0.8,
                       hotGramThreshold: Int = 4096): DataFrame =
    gramPairCounts(docs, id, text, block, n, hotGramThreshold)
      .select(col("id_a"), col("id_b"),
        (col("n_shared").cast("double") / col("n_a")).as("c_ab"),
        (col("n_shared").cast("double") / col("n_b")).as("c_ba"))
      .filter(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .orderBy("id_a", "id_b")

  /** Exact Jaccard for every intra-block pair (idA < idB) with similarity
    * ≥ threshold, over the inverted-index pair core: J = |A∩B| / |A∪B|
    * with the intersection counted from shared-gram join rows and the
    * union derived as n_a + n_b − n_shared. Values are bit-identical to a
    * per-pair sorted-merge over the gram arrays (same integer intersection,
    * same IEEE division), but the shuffle carries 8-byte gram rows instead
    * of whole gram arrays, and pairs sharing no gram — which a size-banding
    * prefilter still has to form and test — never exist at all. (A J ≥ t
    * pair always shares a gram for any t > 0, so nothing is lost.)
    */
  def blockedPairs(docs: DataFrame, id: Column, text: Column, block: Column,
                   n: Int = 3, threshold: Double = 0.5,
                   hotGramThreshold: Int = 4096): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    gramPairCounts(docs, id, text, block, n, hotGramThreshold)
      .select(col("id_a"), col("id_b"),
        (col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
