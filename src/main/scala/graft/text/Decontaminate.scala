package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.NGramJaccard

/** Benchmark decontamination: flag training documents that share a verbatim
  * word n-gram with a held-out evaluation set — the standard contamination
  * check run before training (n-gram overlap form; n = 8 keeps accidental
  * phrase collisions near zero while catching any meaningful copy).
  *
  * Scale shape: the eval side is a benchmark suite — thousands of documents
  * against a corpus of billions — so its distinct gram set is broadcast and
  * the corpus side NEVER shuffles for the probe: the join is map-side
  * against the broadcast hash table, and only the (rare) hit rows reach the
  * per-doc aggregation exchange. The corpus grams are 64-bit rolling
  * hashes (8 bytes/gram, O(tokens) to build, no gram strings); equality
  * mirrors string equality modulo 2⁻⁶⁴ collisions — the same oracle
  * contract as the Jaccard gram family.
  */
object Decontaminate {

  /** Per-contaminated-doc overlap counts: (doc_id, n_hit_grams,
    * n_eval_docs) for every corpus doc sharing ≥ 1 distinct word `n`-gram
    * with any eval doc — `n_hit_grams` distinct shared gram values,
    * `n_eval_docs` distinct eval docs hit. Docs with ≤ n tokens contribute
    * one whole-text gram (the WindowPolyHash short-input contract).
    */
  def overlaps(corpus: DataFrame, evalDocs: DataFrame,
               id: Column, text: Column, n: Int = 8): DataFrame = {
    val corpusGrams = corpus.select(
      id.as("doc_id"), explode(NGramJaccard.ngramSet(text, n)).as("g"))
    val evalGrams = evalDocs.select(
      id.as("eval_id"), explode(NGramJaccard.ngramSet(text, n)).as("g"))
    corpusGrams.join(broadcast(evalGrams), "g")
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_hit_grams"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")
  }

  /** The eval set's distinct gram hashes, collected to the driver — the
    * benchmark suite is bounded by definition (thousands of docs, not
    * corpus-scale), the same justified-collect shape as the ANN index
    * training samples. Feed to [[flagContaminated]].
    */
  def evalGramHashes(evalDocs: DataFrame, id: Column, text: Column,
                     n: Int = 8): Array[Long] =
    evalDocs.select(explode(NGramJaccard.ngramSet(text, n)).as("g"))
      .distinct().orderBy("g")
      .collect().map(_.getLong(0))

  /** Stateless per-doc contamination flag against a pre-collected eval
    * gram set: one `arrays_overlap` against the literal array — a pure
    * map with no shuffle, no state, and no watermark, so the SAME
    * expression runs batch or streaming (append mode) unchanged. The
    * sized-for-broadcast trade vs [[overlaps]]: no per-gram hit counts,
    * but nothing to join either.
    */
  def flagContaminated(docs: DataFrame, evalGrams: Array[Long],
                       id: Column, text: Column, n: Int = 8): DataFrame =
    docs.select(id.as("doc_id"),
      arrays_overlap(NGramJaccard.ngramSet(text, n), typedlit(evalGrams))
        .as("contaminated"))
}
