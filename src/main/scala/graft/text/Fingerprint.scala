package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.{ExactDedup, MinHashLsh}
import graft.functions.TextHashExprs

/** Rolling-hash document fingerprinting (polynomial, 64-bit).
  *
  * A document's fingerprint set is the polynomial hash of every w-token
  * window over its normalized token stream (Karp–Rabin style); the compact
  * per-document summary keeps the full-document hash, the minimum window
  * hash (winnowing's representative pick) and the window count. Two
  * documents sharing any window fingerprint share a w-token run verbatim.
  *
  * Everything is nested higher-order Catalyst expressions over one row —
  * no shuffle, no UDF; Long arithmetic wraps (non-ANSI mode), which is
  * exactly the modular arithmetic a 2^64 polynomial hash wants.
  */
object Fingerprint {

  /** Polynomial base (odd ⇒ invertible mod 2^64, good avalanche with the
    * xxhash64-pre-hashed tokens).
    */
  val Base = 1099511628211L // FNV-1a 64 prime

  /** Polynomial hash of an array of longs: fold h = h * Base + x. */
  def polyHash(xs: Column): Column =
    aggregate(xs, lit(0L), (acc, x) => acc * Base + x)

  /** All w-token-window polynomial hashes of the normalized token stream,
    * via one native rolling-update pass (graft.functions.WindowPolyHash) —
    * O(tokens), not O(tokens × w), and the tokenize→hash subtree is
    * evaluated once (a `transform(sequence…, i => polyHash(slice(…)))`
    * formulation re-tokenizes the document inside every window's lambda).
    * Short documents (≤ w tokens) get their single whole-document hash.
    */
  def windowHashes(text: Column, w: Int): Column =
    TextHashExprs.windowPolyHash(
      transform(MinHashLsh.tokens(ExactDedup.normalize(text)), t => xxhash64(t)), w, Base)

  /** Per-document fingerprint summary: (id, full-doc hash, min window
    * hash, window count, distinct-window count). Normalization-equal
    * documents get identical `doc_fp`; documents sharing a verbatim
    * w-token run share `min_fp` with high probability; a low
    * `n_distinct_fps / n_windows` ratio flags internally repetitive text.
    */
  def fingerprints(docs: DataFrame, id: Column, text: Column, w: Int = 8): DataFrame = {
    val wh = windowHashes(text, w)
    docs.select(
      id.as("doc_id"),
      polyHash(transform(MinHashLsh.tokens(ExactDedup.normalize(text)), t => xxhash64(t))).as("doc_fp"),
      array_min(wh).as("min_fp"),
      size(wh).cast("long").as("n_windows"),
      size(array_distinct(wh)).cast("long").as("n_distinct_fps"))
      .orderBy("doc_id")
  }

  /** Pairs of documents sharing ≥1 window fingerprint (verbatim w-token
    * overlap). The explode → equi-join on the fingerprint is the scale
    * path: shuffle keyed on the 8-byte hash, routed through
    * [[graft.operators.SkewJoin.boundedSelfPairs]] so a hot run cannot
    * concentrate its quadratic pair work in one task.
    *
    * `maxRunDf` is the BOILERPLATE CUTOFF — the semantics knob tiling
    * cannot replace. The operator's output is every pair sharing a run:
    * a run appearing in m documents (license header, nav bar) emits
    * C(m,2) rows, intractable at corpus scale for any plan once m hits
    * millions. A run with document frequency above `maxRunDf` is
    * boilerplate by definition, not duplication signal, so it is excluded
    * from pair enumeration entirely; [[boilerplateRuns]] reports the
    * excluded (fp, run_df) set as the side channel a curation pipeline
    * audits. Pairs from below-cutoff runs are unchanged. Default
    * Int.MaxValue = no cutoff (small-data / faithful form).
    */
  def sharedRunPairs(docs: DataFrame, id: Column, text: Column, w: Int = 8,
                     hotRunThreshold: Int = 4096, maxRunDf: Int = Int.MaxValue): DataFrame = {
    val fps = graft.CachePool.persist(
      docs.select(id.as("fp_id"), explode(array_distinct(windowHashes(text, w))).as("fp")))
    graft.operators.SkewJoin
      .boundedSelfPairs(fps, Seq("fp"), col("fp_id"), lit(0), hotRunThreshold,
        maxKeyCount = maxRunDf)
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("n_shared"))
      .orderBy("id_a", "id_b")
  }

  /** The boilerplate side channel of [[sharedRunPairs]]: every window
    * fingerprint whose document frequency exceeds `maxRunDf`, with its df.
    * Bounded output by construction (≤ totalWindowRows / maxRunDf rows);
    * one key-only count aggregate over the exploded fingerprint frame.
    */
  def boilerplateRuns(docs: DataFrame, id: Column, text: Column, w: Int = 8,
                      maxRunDf: Int = 4096): DataFrame =
    docs.select(id.as("fp_id"), explode(array_distinct(windowHashes(text, w))).as("fp"))
      .groupBy("fp").agg(count(lit(1)).as("run_df"))
      .filter(col("run_df") > maxRunDf)
      .orderBy(col("run_df").desc, col("fp"))
}
