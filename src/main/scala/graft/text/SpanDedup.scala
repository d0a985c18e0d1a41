package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.{ExactDedup, MinHashLsh}

/** Exact duplicated-SPAN excision — the span-level complement of the
  * whole-document dedup family (the "Deduplicating Training Data Makes
  * Language Models Better" rule): a w-token window that occurs anywhere
  * else in the corpus EARLIER (lexicographically by (doc_id, position))
  * is a duplicate occurrence; the union of a document's duplicate-window
  * extents, merged into maximal spans, is the text a curation pipeline
  * cuts out while keeping the one canonical occurrence intact.
  *
  * Distinct from [[Fingerprint.sharedRunPairs]] (which ENUMERATES the
  * pair graph and therefore needs the boilerplate df cutoff): span
  * excision never builds pairs — each window occurrence needs only its
  * run's single GLOBAL FIRST occurrence, so a license header appearing in
  * ten million documents costs one 8-byte-keyed aggregate row plus one
  * probe per occurrence, linear end-to-end. That is what makes this the
  * 100 TB form: shuffle volume is (window-count × 8-byte hash), the
  * per-run state is one (doc, pos) struct, and the span merge is a
  * per-document sorted pass.
  *
  * Hash-equality = run-string-equality modulo 2^-64 collisions — the
  * same contract as the fingerprint family, which is what makes the
  * operator SQL-oracle-checkable (the oracle rebuilds runs as strings).
  */
object SpanDedup {

  /** Maximal duplicated spans per document, as half-open token intervals
    * `[span_start, span_end)` over the normalized token stream (0-based).
    *
    * Rules, all replayed verbatim by the SQL oracle:
    *   - windows are every consecutive `w`-token run; a document with
    *     `1..w` tokens contributes its single whole-stream run (the
    *     [[Fingerprint.windowHashes]] convention); empty docs contribute
    *     nothing.
    *   - an occurrence `(doc, pos)` of a run is DUPLICATE iff it is not
    *     the run's global minimum `(doc, pos)` — so the first occurrence
    *     (and only it) survives, including intra-document repeats.
    *   - a duplicate window covers tokens `[pos, min(pos + w, n_tokens))`;
    *     per document, overlapping-or-touching covered extents merge into
    *     maximal spans (classic gaps-and-islands on the running max end).
    */
  def duplicateSpans(docs: DataFrame, id: Column, text: Column, w: Int = 8): DataFrame = {
    require(w > 0)
    val base = docs.select(
        id.as("doc_id"),
        Fingerprint.windowHashes(text, w).as("whs"),
        size(MinHashLsh.tokens(ExactDedup.normalize(text))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    // one row per window occurrence; pos is the 0-based start token.
    // Persisted: the frame feeds BOTH the first-occurrence aggregate and
    // the probe side of the join — without it the O(tokens) rolling-hash
    // pass runs twice per document (the sharedRunPairs discipline).
    val occ = graft.CachePool.persist(
      base.select(col("doc_id"), col("n_tokens"),
        posexplode(col("whs")).as(Seq("pos", "fp"))))
    // global first occurrence per run: ONE row of state per distinct run
    // (partial-aggregated map-side), however hot the run is
    val first = occ.groupBy("fp")
      .agg(min(struct(col("doc_id"), col("pos"))).as("first"))
    val dup = occ.join(first, "fp")
      .filter(col("doc_id") =!= col("first.doc_id") || col("pos") =!= col("first.pos"))
      .select(col("doc_id"), col("pos"),
        least(col("pos") + w, col("n_tokens")).cast("long").as("cov_end"))
    // merge per-doc intervals: island starts where pos exceeds the max
    // end of every earlier interval (windows of one doc sort by pos;
    // bounded by that doc's window count, never corpus-global)
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runMax = max(col("cov_end"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val isl = dup
      .withColumn("new_isl",
        when(runMax.isNull || col("pos") > runMax, 1L).otherwise(0L))
      .withColumn("isl", sum(col("new_isl"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    isl.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        max(col("cov_end")).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start")).as("span_tokens"))
      .orderBy("doc_id", "span_start")
  }

  /** The excision itself: each document's normalized token stream with
    * every duplicated span CUT OUT, rebuilt as text — the cleaned corpus
    * a downstream tokenizer consumes. Spans ride back onto the doc row
    * as a bounded per-doc array (collect_list of that doc's merged
    * intervals), and the cut is one nested higher-order expression —
    * `filter` with the position index testing `exists` over the span
    * array — so no token-level explode and no extra shuffle beyond
    * [[duplicateSpans]]' own.
    */
  def exciseSpans(docs: DataFrame, id: Column, text: Column, w: Int = 8): DataFrame =
    exciseSpansFrom(docs, id, text, duplicateSpans(docs, id, text, w))

  /** [[exciseSpans]] over an ALREADY-DERIVED span frame (doc_id,
    * span_start, span_end, span_tokens) — the fit-once-serve-many face:
    * the span derivation is one artifact build (graded by its own row),
    * and each consumer cuts against the same extents. Identical output
    * to [[exciseSpans]] given [[duplicateSpans]]' frame.
    */
  def exciseSpansFrom(docs: DataFrame, id: Column, text: Column,
                      spanFrame: DataFrame): DataFrame = {
    val toks = MinHashLsh.tokens(ExactDedup.normalize(text))
    val base = docs.select(id.as("doc_id"), toks.as("tk"))
      .filter(size(col("tk")) > 0)
    val spans = spanFrame
      .groupBy("doc_id")
      .agg(collect_list(struct(col("span_start").as("s"), col("span_end").as("e")))
        .as("sps"))
    val noSpans = array().cast("array<struct<s:bigint,e:bigint>>")
    base.join(spans, Seq("doc_id"), "left")
      .withColumn("sps", coalesce(col("sps"), noSpans))
      .withColumn("kept", filter(col("tk"), (t, i) =>
        !exists(col("sps"), sp =>
          i.cast("long") >= sp.getField("s") && i.cast("long") < sp.getField("e"))))
      .select(col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        size(col("kept")).cast("long").as("n_kept"))
      .orderBy("doc_id")
  }

  /** Per-document excision accounting over [[duplicateSpans]]: total
    * tokens, duplicated tokens (union of spans), surviving tokens — the
    * corpus-shrinkage report a curation run publishes. Documents with no
    * duplicated span appear with zero `dup_tokens` (left join), so the
    * frame is a complete before/after ledger.
    */
  def spanStats(docs: DataFrame, id: Column, text: Column, w: Int = 8): DataFrame =
    spanStatsFrom(docs, id, text, duplicateSpans(docs, id, text, w))

  /** [[spanStats]] over an ALREADY-DERIVED span frame — see
    * [[exciseSpansFrom]].
    */
  def spanStatsFrom(docs: DataFrame, id: Column, text: Column,
                    spanFrame: DataFrame): DataFrame = {
    val base = docs.select(id.as("doc_id"),
      size(MinHashLsh.tokens(ExactDedup.normalize(text))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val spans = spanFrame
      .groupBy("doc_id")
      .agg(sum(col("span_tokens")).as("dup_tokens"),
        count(lit(1)).as("n_spans"))
    base.join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        (col("n_tokens") - coalesce(col("dup_tokens"), lit(0L))).as("kept_tokens"))
      .orderBy("doc_id")
  }
}
