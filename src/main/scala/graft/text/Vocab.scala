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
}
