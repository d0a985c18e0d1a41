package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Integer-certified bigram language-model scoring — the KenLM-shaped
  * perplexity quality filter of CCNet-style pipelines (Wenzek et al.
  * 2020), discretized so every value replays exactly in an external
  * engine: instead of −Σ log p(w_i | w_{i−1}) with float probabilities,
  * each bigram occurrence contributes the BIT LENGTH of its reference
  * count — `length(bin(c))` = ⌊log₂ c⌋ + 1, and 0 when unseen. Summed
  * over a document this is a fixed-point log-likelihood: rank-faithful
  * to the real LM score wherever counts differ by ≥ 2× (the regime that
  * matters — junk bigrams have reference count 0-1, fluent ones
  * hundreds), and bit-for-bit reproducible on any engine with an
  * integer binary-length primitive (both Spark and DuckDB expose `bin`).
  *
  * Grams are the positional rolling-hash bigram windows of the
  * MinHash/fingerprint family (inputs shorter than the window contribute
  * one whole-text gram — the documented WindowPolyHash short-input
  * contract), so hash equality mirrors token-string equality and the
  * oracle replays every count with gram STRINGS.
  *
  * Scale shape is the TF-IDF/OovRate df-join: the reference count frame
  * (gram, c) is one explode + map-side-combinable hash agg; the corpus
  * explodes once and LEFT-joins the counts on the 8-byte gram hash —
  * a 1:1 enrichment per occurrence (a hot gram is an AQE fan-out, never
  * a pair blowup) — then one doc-keyed partial agg. No driver data, no
  * window, no cartesian.
  */
object NgramLm {

  /** Rolling poly-hash base shared with the MinHash/fingerprint gram
    * family.
    */
  private val Base = 1099511628211L

  /** (doc_id, n_tokens, g) — one row per bigram occurrence, off one
    * materialized token-hash attribute (one scan, one tokenize).
    */
  private def bigrams(df: DataFrame, id: Column, text: Column): DataFrame = {
    import graft.functions.TextHashExprs
    val hashed = df.select(id.as("doc_id"),
      transform(TextAnalysis.tokens(text), t => xxhash64(t)).as("__lm_th"))
    hashed.select(col("doc_id"), size(col("__lm_th")).as("n_tokens"),
      explode(TextHashExprs.windowPolyHash(col("__lm_th"), 2, Base)).as("g"))
  }

  /** Reference bigram OCCURRENCE counts: (g, c), c ≥ 1. Build once,
    * reuse across scoring batches.
    */
  def bigramCounts(ref: DataFrame, text: Column): DataFrame =
    bigrams(ref, lit(0L), text).groupBy("g").agg(count(lit(1)).as("c"))

  /** Per-document integer LM stats against a reference corpus:
    * (doc_id, n_tokens, n_grams, n_seen, lp2), ordered by doc_id, where
    * `n_seen` counts occurrences whose bigram exists in the reference
    * and `lp2` = Σ over seen occurrences of (⌊log₂ c⌋ + 1). A document
    * ranks by mean bit-weight lp2/n_grams: appended junk adds unseen
    * grams (0 bits each), so near-dup copies rank strictly below their
    * originals — integers only, hash-exact against the string oracle.
    */
  def scoreStats(corpus: DataFrame, ref: DataFrame, id: Column, text: Column): DataFrame =
    bigrams(corpus, id, text)
      .join(bigramCounts(ref, text), Seq("g"), "left")
      .groupBy("doc_id")
      .agg(
        first("n_tokens").as("n_tokens"),
        count(lit(1)).as("n_grams"),
        sum(when(col("c").isNotNull, 1L).otherwise(0L)).as("n_seen"),
        coalesce(sum(when(col("c").isNotNull,
          length(bin(col("c"))).cast("long")).otherwise(0L)), lit(0L)).as("lp2"))
      .orderBy("doc_id")
}
