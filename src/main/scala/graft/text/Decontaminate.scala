package graft.text

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.NGramJaccard
import graft.functions.TextHashExprs

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
object Decontaminate extends Logging {

  /** Per-contaminated-doc overlap counts: (doc_id, n_hit_grams,
    * n_eval_docs) for every corpus doc sharing ≥ 1 distinct word `n`-gram
    * with any eval doc — `n_hit_grams` distinct shared gram values,
    * `n_eval_docs` distinct eval docs hit. Docs with ≤ n tokens contribute
    * one whole-text gram (the WindowPolyHash short-input contract).
    *
    * The broadcast of the eval gram side assumes the eval set is a
    * BENCHMARK SUITE (bounded by definition); that assumption is enforced
    * rather than trusted: the eval side is counted first (one cheap scan
    * of the small side — no corpus job), and above `maxBroadcastRows`
    * the probe falls back to a plain shuffle join with a warning instead
    * of letting `broadcast()` OOM an executor when someone feeds a corpus
    * as `evalDocs`. Same rows either way; only the plan differs.
    */
  def overlaps(corpus: DataFrame, evalDocs: DataFrame,
               id: Column, text: Column, n: Int = 8,
               maxBroadcastRows: Long = 10000000L): DataFrame =
    hitPairs(corpus, evalDocs, id, text, n, maxBroadcastRows)
      .groupBy("doc_id")
      .agg(count_distinct(col("g")).as("n_hit_grams"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("doc_id")

  /** The contamination report seen from the BENCHMARK side — the table an
    * eval owner actually reads: for every eval document, how many corpus
    * documents share a verbatim n-gram with it and over how many distinct
    * grams (0/0 when clean — every eval doc appears). Same probe plan as
    * [[overlaps]] (broadcast eval side, corpus never shuffles before the
    * join); only the aggregation key flips, and the zero-fill join
    * touches eval-sized frames only.
    */
  def leakReport(corpus: DataFrame, evalDocs: DataFrame,
                 id: Column, text: Column, n: Int = 8,
                 maxBroadcastRows: Long = 10000000L): DataFrame = {
    val hits = hitPairs(corpus, evalDocs, id, text, n, maxBroadcastRows)
      .groupBy("eval_id")
      .agg(count_distinct(col("doc_id")).as("n_corpus_docs"),
        count_distinct(col("g")).as("n_shared_grams"))
    evalDocs.select(id.as("eval_id")).distinct()
      .join(hits, Seq("eval_id"), "left")
      .select(col("eval_id"),
        coalesce(col("n_corpus_docs"), lit(0L)).as("n_corpus_docs"),
        coalesce(col("n_shared_grams"), lit(0L)).as("n_shared_grams"))
      .orderBy("eval_id")
  }

  /** (doc_id, g, eval_id) — one row per (corpus doc, shared gram, eval
    * doc) candidate hit; the broadcast-or-fallback plan shared by
    * [[overlaps]] and [[leakReport]].
    */
  private def hitPairs(corpus: DataFrame, evalDocs: DataFrame,
                       id: Column, text: Column, n: Int,
                       maxBroadcastRows: Long): DataFrame = {
    val corpusGrams = corpus.select(
      id.as("doc_id"), explode(NGramJaccard.ngramSet(text, n)).as("g"))
    val evalGrams = evalDocs.select(
      id.as("eval_id"), explode(NGramJaccard.ngramSet(text, n)).as("g"))
    val nEvalGrams = evalGrams.count()
    if (nEvalGrams <= maxBroadcastRows) corpusGrams.join(broadcast(evalGrams), "g")
    else {
      logWarning(s"Decontaminate: eval side has $nEvalGrams gram rows " +
        s"(> maxBroadcastRows=$maxBroadcastRows); falling back to a shuffle join — " +
        "the corpus side will shuffle. Is the eval set really a benchmark suite?")
      corpusGrams.join(evalGrams.hint("shuffle_hash"), "g")
    }
  }

  /** FUZZY decontamination — the near-duplicate form of [[overlaps]]:
    * an exact n-gram probe misses lightly edited eval copies
    * (reformatted whitespace, trailing additions, paraphrase-like
    * noise), so production pipelines also flag training docs whose
    * MinHash-estimated Jaccard similarity to ANY eval document crosses a
    * threshold — the near-match decontamination step published for
    * GPT-3/Llama-style corpus preparation. Delegates to the two-sided
    * banded signature join of
    * [[graft.dedup.MinHashLsh.crossSnapshotNearDuplicates]] with the
    * corpus on the probe side: the corpus NEVER self-pairs, eval
    * signatures are computed once (the eval set is benchmark-sized), and
    * only band-bucket collisions ever meet — the same bounded-candidate
    * contract as incremental dedup, never corpus × eval.
    *
    * Output: (doc_id, eval_id, est_jaccard ≥ threshold) — the
    * training-side DROP list with its eval-doc provenance, the
    * complement of [[leakReport]]'s eval-side view.
    */
  def overlapsNearDup(corpus: DataFrame, evalDocs: DataFrame,
                      id: Column, text: Column,
                      threshold: Double = 0.5): DataFrame =
    graft.dedup.MinHashLsh
      .crossSnapshotNearDuplicates(corpus, evalDocs, id, text, threshold)
      .select(col("new_id").as("doc_id"), col("old_id").as("eval_id"),
        col("est_jaccard"))

  /** CONTAMINATION WINDOW SWEEP — the k-sensitivity audit of the exact
    * n-gram rule: fixed-k decontamination (the Lee et al. 2022 shape) is
    * always audited with "how does the flagged set move with k?", so
    * this emits, per window size, the corpus-wide contamination report:
    * flagged training docs, distinct shared gram values, eval docs hit.
    *
    * ONE corpus scan for every k (the nested-prefix idiom of the BPE
    * sweep): each side hashes its tokens ONCE per document and the
    * rolling WindowPolyHash re-rolls the SAME token-hash array at every
    * k — O(tokens × |ks|) register arithmetic on one materialized array,
    * not |ks| corpus scans (the per-doc token array is bound through a
    * stack-local projection so the tokenizer runs once, not once per k).
    * The probe keeps the [[overlaps]] plan: eval grams broadcast, the
    * corpus never shuffles before the join, and only (k, hit) rows reach
    * the final k-keyed aggregation — at 100 TB the sweep costs one read
    * of the corpus plus a 4× map-side gram fan-out.
    */
  def overlapSweep(corpus: DataFrame, evalDocs: DataFrame,
                   id: Column, text: Column,
                   ks: Seq[Int] = Seq(8, 13, 25, 50),
                   maxBroadcastRows: Long = 10000000L): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1) && ks == ks.distinct.sorted,
      s"ks must be distinct ascending window sizes: $ks")
    def gramsByK(df: DataFrame, out: String): DataFrame =
      df.select(id.as(out),
          transform(graft.dedup.MinHashLsh.tokens(text), t => xxhash64(t)).as("th"))
        .select(col(out), explode(array(ks.map(k =>
          struct(lit(k).cast("long").as("k"),
            array_distinct(TextHashExprs.windowPolyHash(
              col("th"), k, 1099511628211L)).as("gs"))): _*)).as("kg"))
        .select(col(out), col("kg.k").as("k"), explode(col("kg.gs")).as("g"))
    // the same enforced-not-trusted broadcast guard as overlaps/hitPairs:
    // the sweep's per-k fan-out multiplies the eval side by |ks|, so count
    // the (k, gram) rows first and fall back to a shuffle join (warning,
    // same rows) rather than let broadcast() OOM an executor when a
    // corpus slice arrives as evalDocs (ADVICE r12).
    // persist before counting: the guard count and the join would otherwise
    // each run the full eval-side gram expansion (ADVICE r13) — the frame
    // stays registered in the pool for the batch-boundary release
    val evalGrams = graft.CachePool.persist(gramsByK(evalDocs, "eval_id"))
    val nEvalGrams = evalGrams.count()
    val probeSide =
      if (nEvalGrams <= maxBroadcastRows) broadcast(evalGrams)
      else {
        logWarning(s"Decontaminate.overlapSweep: eval side has $nEvalGrams " +
          s"(k, gram) rows (> maxBroadcastRows=$maxBroadcastRows); falling " +
          "back to a shuffle join — the corpus side will shuffle. Is the " +
          "eval set really a benchmark suite?")
        evalGrams.hint("shuffle_hash")
      }
    gramsByK(corpus, "doc_id")
      .join(probeSide, Seq("k", "g"))
      .groupBy("k")
      .agg(count_distinct(col("doc_id")).as("n_flagged_docs"),
        count_distinct(col("g")).as("n_hit_grams"),
        count_distinct(col("eval_id")).as("n_eval_docs"))
      .orderBy("k")
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
    * gram set: a native binary-search probe of the doc's k grams against
    * the sorted eval array — O(k · log m) per doc, vs `arrays_overlap`'s
    * O(m) linear scan of the eval set for every CLEAN document (the
    * overwhelming majority). A pure map with no shuffle, no state, and no
    * watermark, so the SAME expression runs batch or streaming (append
    * mode) unchanged. The trade vs [[overlaps]]: no per-gram hit counts,
    * but nothing to join either.
    */
  def flagContaminated(docs: DataFrame, evalGrams: Array[Long],
                       id: Column, text: Column, n: Int = 8): DataFrame =
    docs.select(id.as("doc_id"), contaminationFlag(text, evalGrams, n).as("contaminated"))

  /** The probe as a composable Column (shared by [[flagContaminated]] and
    * `DocPipeline.curateStream`): true iff `text` shares any verbatim
    * word n-gram with the pre-collected eval set.
    */
  def contaminationFlag(text: Column, evalGrams: Array[Long], n: Int = 8): Column = {
    val sorted = evalGrams.clone()
    java.util.Arrays.sort(sorted)
    TextHashExprs.sortedContainsAny(NGramJaccard.ngramSet(text, n), sorted)
  }
}
