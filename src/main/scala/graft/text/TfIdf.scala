package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.plans.TopKPerKey

/** TF-IDF term weighting over a document corpus — the standard keyword /
  * topicality signal a training-data pipeline attaches before filtering or
  * clustering (reference has no equivalent; modeled on the classic
  * formulation).
  *
  * Scoring uses the RAW inverse-frequency ratio `tf · N / df` instead of the
  * usual `tf · log(N/df)`: log is monotone, so per-document term RANKING is
  * identical, and avoiding the transcendental keeps every value an exact
  * integer product over one IEEE division — bit-reproducible by any engine
  * (the DuckDB oracle hash-checks it; `log()` differs in the last ulp across
  * libm implementations).
  *
  * Scale shape: one (doc, term) partial-agg shuffle for TF, one term-keyed
  * partial-agg over the TF frame for DF (input is already one row per
  * (doc, term) — no second pass over the corpus), a term-keyed 1:m join
  * (vocabulary grows ~Heaps' law, far sublinear in corpus size; hot terms
  * are 1:m fan-outs, not m², and AQE splits them), and the per-key top-k
  * runs through [[graft.plans.TopKPerKey]] — bounded heaps, map-side
  * capped at k rows per (partition, doc) before the exchange, never a
  * corpus-wide sort.
  */
object TfIdf {

  /** One row per (doc_id, term) with its in-document occurrence count. */
  def termFrequencies(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(id.as("doc_id"), explode(TextAnalysis.tokens(text)).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Document frequencies as ONE streaming-legal aggregation: explode each
    * document's DISTINCT terms and count per term — identical to counting
    * the TF frame's rows (df = number of docs containing the term), but
    * expressed without the intermediate (doc, term) aggregate, which
    * Structured Streaming forbids chaining. The SAME plan therefore runs
    * as a batch query or as an UPDATE-MODE streaming aggregation: Spark
    * keeps per-term state and emits each term's refreshed count every
    * micro-batch — incremental df maintenance, the piece a production
    * curation loop keeps warm instead of recomputing df over the corpus.
    */
  def documentFrequencies(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(array_distinct(TextAnalysis.tokens(text))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))

  /** Mergeable df maintenance — the other half of the incremental loop:
    * a maintained snapshot plus a delta batch's df counts sum per term
    * (df is a count, counts add). union → term-keyed partial agg, so at
    * 100 TB the merge is one map-side-combinable shuffle over two
    * vocabulary-sized frames (Heaps'-law sublinear in corpus size),
    * never a corpus re-scan. Associative and commutative: snapshots
    * merge in any order, shard-parallel.
    */
  def mergeDocumentFrequencies(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("term").agg(sum(col("df")).as("df"))

  /** End-to-end incremental TF-IDF: df is maintained by MERGING the
    * snapshot's and the delta's independently-computed frequency frames
    * (never re-scanning the base corpus), the corpus count by summing two
    * 1-row count frames, and the union scores against the merged state.
    * Output is bit-identical to [[topTerms]] over `base ∪ delta` — the
    * driver-visible certificate that incremental maintenance loses
    * nothing (the oracle for this IS the batch SQL).
    */
  def topTermsIncremental(base: DataFrame, delta: DataFrame,
                          id: Column, text: Column, k: Int = 5): DataFrame = {
    val merged = graft.CachePool.persist(mergeDocumentFrequencies(
      documentFrequencies(base, text), documentFrequencies(delta, text)))
    // corpus size maintained incrementally too: n_base + n_delta, as a
    // merged 1-row frame — no driver-side count action.
    val nDocs = base.agg(count(lit(1)).as("__n_docs"))
      .unionByName(delta.agg(count(lit(1)).as("__n_docs")))
      .agg(sum(col("__n_docs")).cast("long").as("__n_docs"))
    val tf = termFrequencies(base.unionByName(delta), id, text)
    val scored = tf.join(merged, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("__n_docs")).cast("double") / col("df")).as("tfidf"))
    TopKPerKey.topK(scored, Seq("doc_id"),
        Seq(("tfidf", false), ("term", true)), k)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
  }

  /** The incremental RE-SCORE half of the loop: score only `newDocs`
    * against a maintained df snapshot (update df first, then score — the
    * foreachBatch body of a streaming curation pipeline). With
    * `dfreq`/`nDocs` covering the full corpus including `newDocs`, output
    * rows equal [[topTerms]]' rows for those documents bit-for-bit. Terms
    * absent from the snapshot (possible only if df was not updated first)
    * default to df = 1.
    */
  def topTermsAgainst(newDocs: DataFrame, dfreq: DataFrame, nDocs: Long,
                      id: Column, text: Column, k: Int = 5): DataFrame = {
    val tf = termFrequencies(newDocs, id, text)
    val scored = tf.join(dfreq, Seq("term"), "left")
      .select(col("doc_id"), col("term"), col("tf"),
        coalesce(col("df"), lit(1L)).as("df"),
        ((col("tf") * lit(nDocs)).cast("double") / coalesce(col("df"), lit(1L)))
          .as("tfidf"))
    TopKPerKey.topK(scored, Seq("doc_id"),
        Seq(("tfidf", false), ("term", true)), k)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
  }

  /** Top `k` terms per document under BM25 term weighting — the ranking
    * function production retrieval and data-curation keyword scoring
    * actually use, with its tf saturation and document-length
    * normalization (which raw TF-IDF lacks):
    *
    *   score = idf · (tf·(k1+1)) / (tf + k1·(1−b + b·dl/avgdl))
    *
    * Determinism across engines, the same discipline as [[topTerms]]'
    * log-free scoring: the Robertson–Spärck-Jones idf is used in its
    * RATIONAL form (N − df + 0.5)/(df + 0.5) — the usual ln() of it is
    * monotone per term and can be applied at serve time, while libm
    * `log` differs in the last ulp across engines — and the parameters
    * are fixed at k1 = 1.25, b = 0.75: both exact binary fractions
    * (as are k1+1 = 2.25 and 1−b = 0.25), so every factor is an exact
    * IEEE value and the full score is a fixed tree of +,−,×,÷ any engine
    * reproduces bit-for-bit.
    *
    * Scale shape of [[topTerms]] plus one doc-keyed partial agg for
    * document lengths; corpus stats (N, total tokens) ride as broadcast
    * 1-row frames; the per-doc top-k runs through TopKPerKey bounded
    * heaps — never a corpus-wide sort.
    */
  def bm25TopTerms(docs: DataFrame, id: Column, text: Column,
                   k: Int = 5): DataFrame = {
    val tf = graft.CachePool.persist(termFrequencies(docs, id, text))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val dl = tf.groupBy("doc_id").agg(sum(col("tf")).as("dl"))
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val totTok = tf.agg(sum(col("tf")).as("__total_tokens"))
    val scored = tf.join(dfreq, "term").join(dl, "doc_id")
      .crossJoin(broadcast(nDocs))
      .crossJoin(broadcast(totTok))
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("dl"),
        // the exact expression tree the oracle replays — keep the
        // parenthesization in sync with the SQL, IEEE ops are not
        // associative
        (((col("__n_docs").cast("double") - col("df") + lit(0.5)) /
            (col("df") + lit(0.5))) *
          ((col("tf") * lit(2.25)) /
            (col("tf") + lit(1.25) * (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") /
                (col("__total_tokens").cast("double") / col("__n_docs")))))))
          .as("bm25"))
    TopKPerKey.topK(scored, Seq("doc_id"),
        Seq(("bm25", false), ("term", true)), k)
      .orderBy(col("doc_id"), col("bm25").desc, col("term"))
  }

  /** Top `k` terms per document by `tf · N / df` (ties broken by term —
    * a total order, since terms are distinct within a document).
    * Output: (doc_id, term, tf, df, tfidf), ordered (doc_id, tfidf desc,
    * term).
    */
  def topTerms(docs: DataFrame, id: Column, text: Column, k: Int = 5): DataFrame = {
    // persist: DF aggregates over the TF frame and the scoring join re-reads
    // it; without the boundary the tokenize+explode+agg pipeline runs twice.
    val tf = graft.CachePool.persist(termFrequencies(docs, id, text))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    // corpus size as a broadcast 1-row frame — no driver-side count action.
    val nDocs = docs.agg(count(lit(1)).as("__n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        ((col("tf") * col("__n_docs")).cast("double") / col("df")).as("tfidf"))
    TopKPerKey.topK(scored, Seq("doc_id"),
        Seq(("tfidf", false), ("term", true)), k)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
  }
}
