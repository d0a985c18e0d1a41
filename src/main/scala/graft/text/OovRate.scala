package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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

  /** Rolling poly-hash base shared with the MinHash/fingerprint gram
    * family (MinHashLsh.bagShingleHashes uses the same constant).
    */
  private val Base = 1099511628211L

  /** Both gram levels off ONE materialized token-hash attribute — the
    * corpus is scanned and tokenized exactly once (HOFs re-evaluate
    * inlined subtrees, the langId pitfall): (doc_id, n_tokens, lvl, g)
    * with one row per gram occurrence.
    */
  private def levelGrams(df: DataFrame, id: Column, text: Column,
                         levels: Seq[Int]): DataFrame = {
    import graft.functions.TextHashExprs
    val hashed = df.select(id.as("doc_id"),
      transform(TextAnalysis.tokens(text), t => xxhash64(t)).as("__ov_th"))
    val tagged = concat(levels.map(k =>
      transform(TextHashExprs.windowPolyHash(col("__ov_th"), k, Base),
        h => struct(lit(k).as("lvl"), h.as("g")))): _*)
    hashed.select(col("doc_id"), size(col("__ov_th")).as("n_tokens"),
        explode(tagged).as("__ov_lg"))
      .select(col("doc_id"), col("n_tokens"),
        col("__ov_lg.lvl").as("lvl"), col("__ov_lg.g").as("g"))
  }

  /** The reference side's distinct gram hashes at window `k`: (lvl, g). */
  def vocabulary(ref: DataFrame, text: Column, k: Int): DataFrame =
    levelGrams(ref, lit(0L), text, Seq(k)).select("lvl", "g").distinct()

  /** Per-document OOV occurrence counts at unigram and bigram level
    * against the reference corpus's vocabulary. Output: (doc_id,
    * n_tokens, n_uni, n_oov_uni, n_bi, n_oov_bi), ordered by doc_id —
    * integers only, hash-exact against a string-gram oracle. One scan
    * per side: both levels explode off one token-hash materialization.
    */
  def oovStats(corpus: DataFrame, ref: DataFrame, id: Column, text: Column): DataFrame = {
    val grams = levelGrams(corpus, id, text, Seq(1, 2))
    val vocab = levelGrams(ref, lit(0L), text, Seq(1, 2))
      .select("lvl", "g").distinct()
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
