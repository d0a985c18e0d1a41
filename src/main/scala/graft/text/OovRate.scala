package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLsh

/** Out-of-vocabulary scoring against a reference corpus — the cheap,
  * exactly-reproducible proxy for the perplexity/LM quality filter of
  * CCNet-style pipelines: a document whose token stream keeps stepping
  * outside the reference corpus's unigram and bigram vocabulary is
  * out-of-domain or noise, without fitting (or shipping) any LM weights.
  *
  * Counts are OCCURRENCES, not distinct grams (a doc repeating one junk
  * token 500 times should score worse than one mentioning it once).
  * Grams are the positional rolling-hash windows of the MinHash/fingerprint
  * family (unigram = the token's own 64-bit hash, bigram = the 2-token
  * window hash; inputs shorter than the window contribute one whole-text
  * gram — the documented WindowPolyHash short-input contract), so hash
  * equality mirrors token-string equality and an external oracle replays
  * every count with gram STRINGS.
  *
  * Scale shape: the corpus explodes to (doc_id, level, gram) — linear in
  * tokens; the vocabulary is the reference side's DISTINCT gram frame
  * (shuffle-deduped once, reusable across batches); membership is ONE
  * left equi-join on the 8-byte gram hash — a 1:1 enrichment per gram
  * occurrence exactly like the TF-IDF df join, where a hot gram is an AQE
  * fan-out, never a pair blowup — followed by a doc-keyed partial agg.
  * No driver data, no window, no cartesian anywhere.
  */
object OovRate {

  /** The reference side's distinct gram hashes at window `k`: (lvl, g). */
  def vocabulary(ref: DataFrame, text: Column, k: Int): DataFrame =
    ref.select(lit(k).as("lvl"),
        explode(array_distinct(MinHashLsh.bagShingleHashes(text, k))).as("g"))
      .distinct()

  /** Per-document OOV occurrence counts at unigram and bigram level
    * against the reference corpus's vocabulary. Output: (doc_id,
    * n_tokens, n_uni, n_oov_uni, n_bi, n_oov_bi), ordered by doc_id —
    * integers only, hash-exact against a string-gram oracle.
    */
  def oovStats(corpus: DataFrame, ref: DataFrame, id: Column, text: Column): DataFrame = {
    val grams = corpus.select(id.as("doc_id"), size(TextAnalysis.tokens(text)).as("n_tokens"),
        lit(1).as("lvl"), explode(MinHashLsh.bagShingleHashes(text, 1)).as("g"))
      .unionByName(corpus.select(id.as("doc_id"), size(TextAnalysis.tokens(text)).as("n_tokens"),
        lit(2).as("lvl"), explode(MinHashLsh.bagShingleHashes(text, 2)).as("g")))
    val vocab = vocabulary(ref, text, 1)
      .unionByName(vocabulary(ref, text, 2))
      .withColumn("__ov_hit", lit(1))
    grams.join(vocab, Seq("lvl", "g"), "left")
      .groupBy("doc_id")
      .agg(
        first("n_tokens").as("n_tokens"),
        sum(when(col("lvl") === 1, 1L).otherwise(0L)).as("n_uni"),
        sum(when(col("lvl") === 1 && col("__ov_hit").isNull, 1L).otherwise(0L)).as("n_oov_uni"),
        sum(when(col("lvl") === 2, 1L).otherwise(0L)).as("n_bi"),
        sum(when(col("lvl") === 2 && col("__ov_hit").isNull, 1L).otherwise(0L)).as("n_oov_bi"))
      .orderBy("doc_id")
  }
}
