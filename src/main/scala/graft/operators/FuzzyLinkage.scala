package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Blocked edit-distance record linkage (fuzzy join / entity resolution).
  *
  * The classic Fellegi–Sunter-era workflow a training-data pipeline runs to
  * reconcile re-crawled or OCR-noised records against a clean registry:
  * block on a cheap deterministic key (here the record string's first two
  * tokens — the "trustworthy field" discipline: blocking trades recall for
  * scale, so the key must come from the part of the record the noise class
  * does not touch), generate candidates by an equi-join on the block key,
  * prune by the |len(a) − len(b)| ≤ maxDist band (an edit can change length
  * by at most 1), then confirm with the EXACT bounded Levenshtein distance.
  *
  * Scale design (100 TB):
  *  - Candidates form ONLY via the block-key equi-join — never all-pairs.
  *    Shuffle keys are the block strings; candidate rows carry the two
  *    record strings and ids, nothing else.
  *  - A hot block (a very common two-token prefix) cannot hand one task its
  *    whole candidate rectangle: index rows count per block through one
  *    window (same exchange the join needs anyway), blocks above
  *    `hotBlockThreshold` split into S = ⌈count/threshold⌉ salt cells —
  *    probe rows replicate S ways, index rows hash into one cell — so
  *    per-task work is bounded by probe_rows × hotBlockThreshold while the
  *    candidate SET is unchanged (each index row lands in exactly one cell).
  *  - The distance is the THRESHOLD form `levenshtein(a, b, maxDist)`
  *    (Ukkonen banding: O(maxDist · len) per pair, returns −1 past the
  *    bound) — the full O(len²) DP never runs.
  *  - The per-probe argmin reduces on (dist, id) packed into ONE integer
  *    (`dist · 10^8 + id` — ids are < 10^8 by the planted-id convention), so
  *    the summary is a plain hash aggregate with map-side combine, not a
  *    rank window.
  */
object FuzzyLinkage {

  /** First-`k`-token blocking key of a record string (whitespace tokens;
    * `slice` + `array_join` so short strings degrade gracefully instead of
    * erroring under ANSI element_at).
    */
  def blockKey(s: Column, k: Int = 2): Column =
    array_join(slice(TextAnalysis.tokens(s), 1, k), " ")

  /** Candidate pairs: probe × index equi-join on the block key with the
    * length-band prefilter, hot blocks salted. Returns
    * (probe_id, index_id, probe_str, index_str) — one row per surviving
    * candidate, identical to the unsalted join's row set.
    */
  def candidates(probe: DataFrame, probeId: Column, probeStr: Column,
                 index: DataFrame, indexId: Column, indexStr: Column,
                 maxDist: Int, hotBlockThreshold: Int = 4096): DataFrame = {
    val p = probe.select(probeId.as("probe_id"), probeStr.as("probe_str"),
      blockKey(probeStr).as("blk"))
    val perBlk = Window.partitionBy("blk")
    val i = index.select(indexId.as("index_id"), indexStr.as("index_str"),
      blockKey(indexStr).as("blk"))
      .withColumn("__s",
        ceil(count(lit(1)).over(perBlk).cast("double") / hotBlockThreshold).cast("int"))
      .withColumn("__c", pmod(xxhash64(col("index_id")), col("__s").cast("long")).cast("int"))
    // Probe rows learn each block's salt count from the index side's
    // aggregate (distinct (blk, __s) is one row per block — co-partitioned
    // join on blk, no extra pass over the data): replicate over 0..S−1.
    val blkS = i.select(col("blk"), col("__s")).distinct()
    val pSalted = p.join(blkS, Seq("blk"))
      .select(col("blk"), col("probe_id"), col("probe_str"),
        explode(sequence(lit(0), col("__s") - 1)).as("__c"))
    pSalted.join(i, Seq("blk", "__c"))
      .filter(abs(length(col("probe_str")) - length(col("index_str"))) <= maxDist)
      .select(col("probe_id"), col("index_id"), col("probe_str"), col("index_str"))
  }

  /** Per-probe linkage summary over the candidate pairs:
    * (probe_id, n_cand, n_matches, best_dist, best_index_id) — a probe with
    * no block-mates (or none within `maxDist`) reports (0, 0, −1, −1), so
    * the no-match branch is a graded row, not an absent one. `best` is the
    * (dist, index_id)-lexicographic argmin — deterministic under ties.
    */
  def linkSummary(probe: DataFrame, probeId: Column, probeStr: Column,
                  index: DataFrame, indexId: Column, indexStr: Column,
                  maxDist: Int, hotBlockThreshold: Int = 4096): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val cand = candidates(probe, probeId, probeStr, index, indexId, indexStr,
      maxDist, hotBlockThreshold)
      .withColumn("dist", levenshtein(col("probe_str"), col("index_str"), maxDist))
      .withColumn("is_match", col("dist") >= 0 && col("dist") <= maxDist)
    val agg = cand.groupBy("probe_id").agg(
      count(lit(1)).as("n_cand"),
      sum(when(col("is_match"), 1L).otherwise(0L)).as("n_matches"),
      min(when(col("is_match"),
        col("dist").cast("long") * 100000000L + col("index_id"))).as("best_key"))
    probe.select(probeId.as("probe_id")).distinct()
      .join(agg, Seq("probe_id"), "left")
      .select(col("probe_id"),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        coalesce(expr("best_key div 100000000"), lit(-1L)).as("best_dist"),
        coalesce(pmod(col("best_key"), lit(100000000L)).cast("long"), lit(-1L))
          .as("best_index_id"))
  }
}

/** Deterministic dirty-record planting for linkage verification: the clean
  * registry is the documents' 8-token title; each title also ships a dirty
  * twin (id + 7,000,000) in one of three noise classes by `doc_id % 3`:
  *  - 0: last character deleted            → distance 1, must link;
  *  - 1: last two characters → "qz"        → distance ≤ 2, must link;
  *  - 2: every vowel → "x"                 → distance ≫ 2 for real titles
  *       (and the mangled first tokens usually shift its BLOCK), so it
  *       exercises the no-match and empty-block branches.
  * Mirrored 1:1 by the DuckDB CTE in SparkEntry.
  */
object LinkData {

  val DirtyIdOffset = 7000000L

  /** (doc_id, title): the 8-token clean registry string. */
  def titles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      array_join(slice(TextAnalysis.tokens(col("text")), 1, 8), " ").as("title"))

  /** The dirty probe side derived from the clean titles. */
  def dirtyRecords(titles: DataFrame): DataFrame = {
    val t = col("title")
    titles.select(
      (col("doc_id") + DirtyIdOffset).as("doc_id"),
      when(col("doc_id") % 3 === 0,
          t.substr(lit(1), greatest(length(t) - 1, lit(0))))
        .when(col("doc_id") % 3 === 1,
          concat(t.substr(lit(1), greatest(length(t) - 2, lit(0))), lit("qz")))
        .otherwise(regexp_replace(t, "[aeiou]", "x"))
        .as("title"))
  }
}
