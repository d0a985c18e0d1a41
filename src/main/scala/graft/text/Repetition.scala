package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh

/** Intra-document repetition statistics — the Gopher-style quality signal
  * (Rae et al. 2021 §A1.1: "fraction of ... in duplicate n-grams") that
  * filters boilerplate-heavy and looping documents before training
  * (reference has no equivalent; a standard LLM-corpus filter).
  *
  * Form graded here: the OCCURRENCE fraction — of all positional word
  * n-grams in the document, the fraction whose gram value occurs ≥ 2 times
  * in that same document. Exact integer counts over 64-bit gram hashes
  * (hash equality mirrors string equality modulo 2⁻⁶⁴ collisions — the same
  * contract as the gram-string DuckDB oracles of the Jaccard family).
  *
  * Scale shape: explode positional gram hashes (8 bytes each — the rolling
  * WindowPolyHash, O(tokens), no gram strings ever materialize), partial-agg
  * count by (doc, gram), partial-agg again by doc. Both shuffles are keyed
  * by doc_id(+gram): map-side combine applies, no joins, no windows — the
  * op is embarrassingly doc-parallel at any corpus size.
  */
object Repetition {

  /** Per-document repetition stats over positional word `n`-grams:
    * (doc_id, n_grams, n_rep, max_gram_count, rep_ratio) where `n_rep`
    * counts gram OCCURRENCES whose value repeats within the doc and
    * `rep_ratio = n_rep / n_grams`. Docs with ≤ n tokens contribute one
    * whole-text gram (the WindowPolyHash short-input contract).
    */
  def repetitionStats(docs: DataFrame, id: Column, text: Column, n: Int = 2): DataFrame = {
    val occurrences = docs.select(
      id.as("doc_id"), explode(MinHashLsh.bagShingleHashes(text, n)).as("g"))
    occurrences.groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(
        sum("c").as("n_grams"),
        sum(when(col("c") >= 2, col("c")).otherwise(0L)).as("n_rep"),
        max("c").as("max_gram_count"))
      .select(col("doc_id"), col("n_grams"), col("n_rep"), col("max_gram_count"),
        (col("n_rep").cast("double") / col("n_grams")).as("rep_ratio"))
      .orderBy("doc_id")
  }
}
