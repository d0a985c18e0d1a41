package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.ExactDedup

/** End-to-end training-corpus preparation over the documents table — the
  * §2.2 counterpart of the reference's geo pipeline: one composed Catalyst
  * plan, no intermediate materialization.
  *
  *   normalize → quality features → filter → exact dedup (keep min id)
  *   → per-language corpus stats.
  *
  * Determinism: the aggregate emits counts, integer sums and min/max of a
  * per-row deterministic score — never an order-dependent double sum.
  */
object DocPipeline {

  /** Per-row quality features + score — the single shared definitions
    * from [[TextAnalysis]], so this pipeline and `q_quality_score` can
    * never disagree on the same rows.
    */
  def withQuality(docs: DataFrame, text: Column): DataFrame =
    TextAnalysis.withQualityFeatures(docs, text)
      .withColumn("quality_score", TextAnalysis.qualityScoreExpr)

  /** Quality gate: droppable docs are too short, too long, or punctuation
    * soup. Thresholds are pipeline parameters, not truths.
    */
  def qualityFilter(minTokens: Int = 5, maxTokens: Int = 5000,
                    maxPunctRatio: Double = 0.2): Column =
    col("n_tokens").between(minTokens, maxTokens) &&
      (col("n_punct").cast("double") / col("n_chars_c")) <= maxPunctRatio

  /** The cleaned, deduplicated corpus with quality features attached. */
  def corpus(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val featured = withQuality(docs, text).filter(qualityFilter())
    ExactDedup.dedup(featured, text, id)
  }

  /** Per-source quality quota — the domain-mix rebalancing step of corpus
    * curation: keep at most `k` docs per source, best quality first
    * (doc_id tie-break). Runs through [[graft.plans.TopKPerKey]], so the
    * cap is enforced with bounded per-key heaps, map-side partial before
    * the exchange — never a corpus-wide sort or a global window, and a
    * source with a billion docs still ships at most k rows per map task.
    */
  def sourceQuota(docs: DataFrame, id: Column, text: Column,
                  source: Column, k: Int): DataFrame = {
    val scored = withQuality(
        docs.select(id.as("doc_id"), source.as("source"), text.as("__sq_text")),
        col("__sq_text"))
      .select("doc_id", "source", "quality_score")
    graft.plans.TopKPerKey.topK(scored, Seq("source"),
        Seq(("quality_score", false), ("doc_id", true)), k)
      .orderBy("source", "doc_id")
  }

  /** Per-source quality ECDF deciles — the classifier-free twin of the
    * calibration table: rank every doc inside its source by the quality
    * total order (quality DESC, doc_id ASC), convert rank to
    * percent_rank (an exact (rk−1)/(n−1) IEEE division both engines
    * reproduce bit-for-bit given the same order), floor into deciles,
    * and certify each (source, decile) cell with integer facts — count
    * and Σ doc_id — so a single mis-ordered document anywhere shifts a
    * cell checksum. The window partitions BY SOURCE (bounded state per
    * key), never globally; at 100 TB the same shape runs per domain.
    */
  def qualityEcdfDeciles(docs: DataFrame, id: Column, text: Column,
                         source: Column): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    withQuality(
        docs.select(id.as("doc_id"), source.as("source"), text.as("__qe_text")),
        col("__qe_text"))
      .select(col("doc_id"), col("source"), col("quality_score"))
      .withColumn("__qe_pct", percent_rank().over(w))
      .withColumn("decile",
        least(floor(col("__qe_pct") * 10), lit(9L)).cast("long"))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("sum_ids"))
      .orderBy("source", "decile")
  }

  /** KEYSET-paginated per-source quality ranking — the "page N" shape
    * that OFFSET cannot survive at scale: OFFSET re-ranks (and at 100 TB
    * re-sorts) everything before the requested page on EVERY page, while
    * a keyset cursor filters to strictly-after-the-cursor rows map-side
    * and re-runs the same bounded-heap top-k. `cursors` is one
    * (source, cursor) row per source — the LAST row of the previous page
    * under the (quality DESC, doc_id ASC) total order, encoded as
    * `struct(quality, -doc_id)` so ONE lexicographic `<` is exactly
    * "after the cursor" — broadcast onto the corpus. No cursors → first
    * page. Pages are identical to rank-window slices (the oracle
    * replays page 2 as ranks k+1..2k) at a per-page cost independent of
    * page number.
    */
  def pageByQuality(scored: DataFrame, k: Int,
                    cursors: Option[DataFrame] = None): DataFrame = {
    val base = cursors match {
      case Some(c) => scored.join(broadcast(c), "source")
        .filter(struct(col("quality_score"), -col("doc_id")) < col("cursor"))
        .drop("cursor")
      case None => scored
    }
    graft.plans.TopKPerKey.topK(base, Seq("source"),
      Seq(("quality_score", false), ("doc_id", true)), k)
  }

  /** The continuation cursors of a page from [[pageByQuality]]: per
    * source, the page's last row under the pagination order (= the
    * MINIMUM of the keyset struct). Bounded: one row per source.
    */
  def pageCursors(page: DataFrame): DataFrame =
    page.groupBy("source")
      .agg(min(struct(col("quality_score"), -col("doc_id"))).as("cursor"))

  /** The incremental curation loop as ONE streaming-legal pass:
    * quality gate → decontamination probe → exact dedup. The gate and the
    * probe are stateless projections/filters; the dedup is
    * `dropDuplicates` on the normalized-text hash, whose per-key state is
    * the only state in the query (bound it upstream with a watermark when
    * the stream carries event time; unbounded here by the same contract
    * as a batch dedup's shuffle). The SAME function runs batch or
    * streaming (append mode) unchanged — streaming keeps the FIRST
    * arrival per key, which equals batch's keep-min-id whenever ids
    * arrive in order. Output: (doc_id, quality_score) of survivors.
    */
  def curateStream(docs: DataFrame, id: Column, text: Column,
                   evalGrams: Array[Long]): DataFrame = {
    val gated = withQuality(
        docs.select(id.as("doc_id"), text.as("__cs_text")), col("__cs_text"))
      .filter(qualityFilter())
    val clean = gated.filter(
      !Decontaminate.contaminationFlag(col("__cs_text"), evalGrams))
    clean
      .withColumn("__cs_key", xxhash64(ExactDedup.normalize(col("__cs_text"))))
      .dropDuplicates("__cs_key")
      .select(col("doc_id"), col("quality_score"))
  }

  /** [[curateStream]] with WATERMARK-BOUNDED dedup state — the form a
    * forever-running crawl ingest actually deploys. The per-key dedup
    * state of `dropDuplicates` never ages out; here the stream carries an
    * event time (crawl timestamp), the watermark trails it by `delay`,
    * and `dropDuplicatesWithinWatermark` evicts a key's state once the
    * watermark passes its horizon. Contract: duplicates arriving within
    * `delay` of the first copy are dropped (the guarantee re-crawl storms
    * need); a copy arriving LATER than `delay` after the original is
    * re-admitted — by then it is a re-crawl, not a storm, and the
    * downstream batch dedup (exact or near) owns it. State is bounded by
    * arrival rate × delay instead of corpus cardinality. Output adds the
    * event time so downstream sinks can window it.
    */
  def curateStreamWatermarked(docs: DataFrame, id: Column, text: Column,
                              eventTime: Column, delay: String,
                              evalGrams: Array[Long]): DataFrame = {
    val gated = withQuality(
        docs.select(id.as("doc_id"), eventTime.as("__cs_ts"),
          text.as("__cs_text")), col("__cs_text"))
      .filter(qualityFilter())
    val clean = gated.filter(
      !Decontaminate.contaminationFlag(col("__cs_text"), evalGrams))
    clean
      .withColumn("__cs_key", xxhash64(ExactDedup.normalize(col("__cs_text"))))
      .withWatermark("__cs_ts", delay)
      .dropDuplicatesWithinWatermark("__cs_key")
      .select(col("doc_id"), col("__cs_ts").as("event_ts"), col("quality_score"))
  }

  /** Canonical-document selection: ONE survivor per near-duplicate
    * cluster by QUALITY (argmax `quality_score`, doc_id tie-break) — the
    * policy production pipelines actually want after closure, where
    * min-id keeps whichever copy happened to be crawled first and this
    * keeps the best one. Documents outside the pair graph are their own
    * clusters and always survive. Shapes: the closure is
    * [[graft.dedup.DedupClusters.componentsAuto]] (equi-join rounds);
    * the vertex→score attach is a left join on the 8-byte id; the
    * per-cluster argmax runs through [[graft.plans.TopKPerKey]] with
    * k = 1 (bounded heaps, map-side partial — a million-member
    * boilerplate cluster ships one row per map task, never a window over
    * the corpus). Output: (comp, doc_id, quality_score), one row per
    * cluster, ordered by comp.
    */
  def survivorsByQuality(docs: DataFrame, id: Column, text: Column,
                         pairs: DataFrame): DataFrame =
    survivorsFromLabeled(clusterLabeled(docs, id, text, pairs))

  /** The closure + quality attach HALF of [[survivorsByQuality]]: every
    * document labeled with its cluster (its own id when outside the pair
    * graph) and its quality score — exposed so gates can check the argmax
    * contract against cluster members WITHOUT re-running the closure.
    * Output: (comp, doc_id, quality_score), one row per document.
    */
  def clusterLabeled(docs: DataFrame, id: Column, text: Column,
                     pairs: DataFrame): DataFrame =
    clusterLabeledFromComp(docs, id, text,
      graft.dedup.DedupClusters.componentsAuto(pairs))

  /** [[clusterLabeled]] over an ALREADY-CLOSED component map (id, comp) —
    * the fit-once-serve-many face: the closure is one artifact build
    * (graded by its own row), and each survivor-policy consumer attaches
    * quality to the same labels instead of re-closing the pair graph.
    * Same output as [[clusterLabeled]] given the same closure.
    */
  def clusterLabeledFromComp(docs: DataFrame, id: Column, text: Column,
                             comp: DataFrame): DataFrame = {
    val scored = withQuality(
        docs.select(id.as("doc_id"), text.as("__sv_text")), col("__sv_text"))
      .select(col("doc_id"), col("quality_score"))
    scored.join(comp.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("comp", coalesce(col("comp"), col("doc_id")))
      .select("comp", "doc_id", "quality_score")
  }

  /** The argmax HALF of [[survivorsByQuality]] over a
    * [[clusterLabeled]]-shaped frame.
    */
  def survivorsFromLabeled(labeled: DataFrame): DataFrame =
    graft.plans.TopKPerKey.topK(
        labeled.select("comp", "doc_id", "quality_score"),
        Seq("comp"), Seq(("quality_score", false), ("doc_id", true)), 1)
      .orderBy("comp")

  /** Stage-by-stage survivor accounting for the curation cascade — the
    * funnel metric every production pipeline reports: how many documents
    * remain after each of raw → quality gate → decontamination → exact
    * dedup → per-source quota. ONE scan of the corpus computes all per-row
    * flags (quality features, the broadcast-free sorted-probe
    * contamination flag, the normalized-text hash — all stateless
    * projections); the counting is a constant number of partial-agg
    * exchanges over tiny frames (per-hash survivors, then per-source
    * counts), never a corpus-wide sort or window. The flagged frame is
    * persisted once because the totals and the dedup branch both read it.
    *
    * Dedup keeps one survivor per normalized-text hash (the survivor's
    * source is that of the min doc_id, via `min_by` — one agg, no window);
    * the quota stage caps survivors per source at `quotaK`, so its count
    * is Σ_s min(k, survivors_s) — pure arithmetic on the per-source
    * counts, no second pass. Output: (stage, stage_name, n_out), 5 rows.
    */
  def filterFunnel(docs: DataFrame, id: Column, text: Column, source: Column,
                   evalGrams: Array[Long], quotaK: Int = 15): DataFrame = {
    val flagged = withQuality(
        docs.select(id.as("doc_id"), source.as("source"), text.as("__ff_text")),
        col("__ff_text"))
      .withColumn("__ff_q", qualityFilter())
      .withColumn("__ff_clean", !Decontaminate.contaminationFlag(col("__ff_text"), evalGrams))
      .withColumn("__ff_h", xxhash64(ExactDedup.normalize(col("__ff_text"))))
      .select("doc_id", "source", "__ff_q", "__ff_clean", "__ff_h")
    val persisted = graft.CachePool.persist(flagged)
    val totals = persisted.agg(
      count(lit(1)).as("n_raw"),
      coalesce(sum(when(col("__ff_q"), 1L).otherwise(0L)), lit(0L)).as("n_quality"),
      coalesce(sum(when(col("__ff_q") && col("__ff_clean"), 1L).otherwise(0L)), lit(0L))
        .as("n_decontam"))
    val survivorsPerSource = persisted
      .filter(col("__ff_q") && col("__ff_clean"))
      .groupBy("__ff_h")
      .agg(min_by(col("source"), col("doc_id")).as("source"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_s"))
    // coalesce: a corpus whose every doc fails the gates leaves the
    // survivor frame empty, and sum-over-empty is NULL, not 0
    val dedupQuota = survivorsPerSource.agg(
      coalesce(sum(col("n_s")), lit(0L)).as("n_dedup"),
      coalesce(sum(least(col("n_s"), lit(quotaK.toLong))), lit(0L)).as("n_quota"))
    totals.crossJoin(dedupQuota)
      .select(explode(array(
        struct(lit(0L).as("stage"), lit("raw").as("stage_name"), col("n_raw").as("n_out")),
        struct(lit(1L).as("stage"), lit("quality").as("stage_name"), col("n_quality").as("n_out")),
        struct(lit(2L).as("stage"), lit("decontaminate").as("stage_name"), col("n_decontam").as("n_out")),
        struct(lit(3L).as("stage"), lit("dedup").as("stage_name"), col("n_dedup").as("n_out")),
        struct(lit(4L).as("stage"), lit("quota").as("stage_name"), col("n_quota").as("n_out")))).as("s"))
      .select(col("s.stage").as("stage"), col("s.stage_name").as("stage_name"),
        col("s.n_out").as("n_out"))
      .orderBy("stage")
  }

  /** Per-language corpus statistics over the deduplicated corpus. */
  def corpusStats(docs: DataFrame, id: Column, text: Column): DataFrame =
    corpus(docs, id, text)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        min(col("quality_score")).as("min_q"),
        max(col("quality_score")).as("max_q"))
      .orderBy("lang")
}
