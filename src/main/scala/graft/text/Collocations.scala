package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.{ExactDedup, MinHashLsh}

/** Collocation mining: adjacent-token pairs ranked by PMI lift — the
  * corpus-statistics pass behind phrase vocabularies ("new york"-style
  * merge candidates), tokenizer pre-merges, and boilerplate phrase
  * audits.
  *
  * Scoring is the LOG-FREE lift `n_ab·N / (n_a·n_b)` (PMI = log lift is
  * monotone, so ranks are identical): counts below 2^53 cast to DOUBLE
  * exactly and the two-multiply-one-divide tree is fixed IEEE, so the
  * score is bit-reproducible across engines — the q_bm25/q_hybrid_search
  * convention.
  *
  * Scale: unigram and bigram counts are partial-aggregated groupBys keyed
  * by token text (vocab-bounded state; stopword hot keys combine
  * map-side), the count joins are equi-joins on the word, and the top-k
  * is an ORDER BY … LIMIT — TakeOrderedAndProject, never a global sort.
  */
object Collocations {

  /** Top-`k` adjacent-pair collocations with corpus bigram count
    * ≥ `minCount`, ranked by lift (desc) with the (a, b) pair as the
    * deterministic tie-break. Output: (a, b, n_ab, n_a, n_b, lift).
    */
  def pmiBigrams(docs: DataFrame, text: Column, minCount: Long = 10L,
                 k: Int = 50): DataFrame = {
    require(minCount >= 1 && k >= 1)
    val tk = MinHashLsh.tokens(ExactDedup.normalize(text))
    // persisted: the tokenized frame feeds both the unigram aggregate and
    // the bigram pair derivation — without it the corpus-wide
    // normalize+tokenize pass runs twice
    val toks = graft.CachePool.persist(
      docs.select(tk.as("tk")).filter(size(col("tk")) >= 1))
    val uni = graft.CachePool.persist(
      toks.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("n")))
    val total = uni.agg(sum(col("n")).as("n_tot"))
    val pairs = toks.filter(size(col("tk")) >= 2)
      .select(explode(arrays_zip(
        slice(col("tk"), lit(1), size(col("tk")) - 1),
        slice(col("tk"), lit(2), size(col("tk")) - 1))).as("bg"))
      .select(col("bg.0").as("a"), col("bg.1").as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(uni.select(col("w").as("a"), col("n").as("n_a")), "a")
      .join(uni.select(col("w").as("b"), col("n").as("n_b")), "b")
      .crossJoin(broadcast(total))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") * col("n_tot").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
      .orderBy(col("lift").desc, col("a"), col("b"))
      .limit(k)
  }
}
