package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-wide vocabulary statistics — the precursor every tokenizer /
  * BPE-vocabulary induction run starts from: for each term, its total
  * occurrence count and its document frequency, capped to the k most
  * frequent terms.
  *
  * Scale shape: the exploded (doc_id, term) frame is corpus-token-sized
  * but never materialized — it flows straight into a hash aggregate keyed
  * on term. `count_distinct(doc_id)` plans as the two-phase expand
  * (partial on (term, doc_id), then count) — both phases map-side
  * combinable; the cap is a `TakeOrderedAndProject` (bounded k rows per
  * partition reach the driver), NEVER a global sort of the vocabulary.
  * For the sketch form of distinct counting at extreme cardinality, see
  * [[graft.analytics.Stats.ndvSketch]].
  */
object Vocab {

  /** (term, n_occ, df) for the k most frequent terms, occurrence-ranked
    * with a term tie-break.
    */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int): DataFrame =
    docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy("term")
      .agg(count(lit(1)).as("n_occ"), count_distinct(col("doc_id")).as("df"))
      .orderBy(col("n_occ").desc, col("term"))
      .limit(k)

  /** The first BPE-induction step: adjacent character-pair frequencies
    * over the word vocabulary, each pair weighted by its word's corpus
    * occurrence count — the statistic whose argmax is the first merge
    * rule. Classic BPE iterates this driver-side over the (bounded)
    * vocabulary; the EXPENSIVE part at 100 TB is the word count itself,
    * which is [[topTerms]]' distributed agg. Here the pair explode runs
    * over the top-`topWords` words only (bounded rows × bounded term
    * length), so the whole statistic stays one short plan: vocab agg →
    * per-word pair explode → pair agg → `TakeOrderedAndProject` cap.
    *
    * Single-character words contribute no pairs (the `length >= 2` guard
    * matters: Spark's `sequence(1, 0)` counts DOWN, it is not empty).
    */
  def mergePairStats(docs: DataFrame, id: Column, text: Column,
                     topWords: Int, k: Int): DataFrame = {
    val words = topTerms(docs, id, text, topWords)
    val pairs = when(length(col("term")) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), length(col("term")) - 1),
        i => col("term").substr(i, lit(2))))
    words.select(explode(pairs).as("pair"), col("n_occ"))
      .groupBy("pair")
      .agg(sum(col("n_occ")).as("n_weighted"))
      .orderBy(col("n_weighted").desc, col("pair"))
      .limit(k)
  }
}
