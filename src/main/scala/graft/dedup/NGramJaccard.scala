package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextHashExprs

/** Exact word-n-gram Jaccard similarity over candidate pairs.
  *
  * Exact set Jaccard is O(pairs × shingles) — never run it all-pairs at
  * scale. Candidates come from a cheap blocking stage (a blocking column
  * here; MinHash/SimHash LSH in the general case), then the exact score
  * confirms. The blocked self-join is an equi-join on the block key:
  * shuffle-partitionable, AQE-skew-handled.
  *
  * Scale/CPU design: gram sets are 64-bit hashes (long arrays), not
  * strings — set intersection compares 8-byte values instead of hashing
  * variable-length strings, and the shuffled candidate rows carry ~8 bytes
  * per gram. A size prefilter (J(A,B) ≤ min|A|,|B| / max|A|,|B|) discards
  * most pairs before any set operation runs.
  */
object NGramJaccard {

  /** Distinct word n-gram set of a text column, as SORTED 64-bit gram
    * hashes (rolling window-poly over per-token hashes — O(tokens), see
    * MinHashLsh.shingleHashes; sorted so pair intersection is a linear
    * merge).
    */
  def ngramSet(text: Column, n: Int): Column =
    array_sort(MinHashLsh.shingleHashes(text, n))

  /** |A ∩ B| / |A ∪ B| over two sorted long-array columns: one native
    * merge-count per evaluation, |A ∪ B| derived as |A| + |B| − |A ∩ B|.
    */
  def jaccard(a: Column, b: Column): Column = {
    val inter = TextHashExprs.sortedIntersectCount(a, b)
    inter.cast("double") / (size(a) + size(b) - inter)
  }

  /** Containment C(A→B) = |A ∩ B| / |A|: catches near-SUPERSET duplicates
    * (a doc quoting most of another) that symmetric Jaccard misses —
    * J(A,B) is small when |B| ≫ |A| even if A ⊂ B.
    */
  def containment(a: Column, b: Column): Column =
    TextHashExprs.sortedIntersectCount(a, b).cast("double") / size(a)

  /** Per-document gram sets: (blk, nj_id, grams) with `grams` the sorted
    * distinct 64-bit gram hashes. The single frame the whole pair core
    * derives from — candidate generation explodes it, verification
    * merge-intersects it.
    */
  private[dedup] def gramSets(docs: DataFrame, id: Column, text: Column,
                              block: Column, n: Int): DataFrame =
    docs.select(block.as("blk"), id.as("nj_id"), ngramSet(text, n).as("grams"))

  /** PREFIX-FILTERED candidate pairs (id_a < id_b, distinct): the PPJoin-
    * family pruning that keeps total candidate volume bounded at scale.
    *
    * Grams are ordered by ascending document frequency within the block
    * (ties by gram hash — a total order). With α = ⌈t·|A|⌉, any pair
    * satisfying the similarity predicate shares its df-smallest common gram
    * inside the first |A| − α + 1 grams of each/the smaller side (prefix
    * lemma: if the smallest shared gram sat outside that prefix, the ≤ α−1
    * grams after it could not hold all ≥ α shared grams). So:
    *
    *  - `symmetric` (Jaccard ≥ t): J ≥ t ⟹ |A∩B| ≥ t·max(|A|,|B|), and a
    *    prefix × prefix join on the gram hash finds every qualifying pair.
    *  - asymmetric (containment, either direction ≥ t ⟺
    *    |A∩B| ≥ t·min(|A|,|B|)): the smaller side's prefix must collide
    *    with the larger side's FULL gram list, so prefixes probe a full
    *    inverted index.
    *
    * This is what kills stop-grams: a gram shared by m documents generates
    * candidates only from documents whose PREFIX contains it — and a
    * high-df gram is by construction last in the df order, so it falls in
    * almost no prefix. Total candidate volume drops from Σ m_g² to
    * Σ p_g·m_g (p_g ≈ 0 for stop-grams) without losing a single
    * qualifying pair.
    *
    * Per-task bounding on top of total-volume pruning: the symmetric join
    * routes through [[graft.operators.SkewJoin.boundedSelfPairs]]; the
    * asymmetric join salts grams whose full-side frequency exceeds
    * `hotGramThreshold` (probe rows replicate over ⌈df/threshold⌉ salts,
    * index rows hash into them), so even a pathological hot gram cannot
    * hand one task its whole candidate rectangle.
    */
  private[dedup] def candidatePairs(sets: DataFrame, threshold: Double,
                                    symmetric: Boolean,
                                    hotGramThreshold: Int): DataFrame = {
    val exploded = sets.select(col("blk"), col("nj_id"),
      size(col("grams")).as("n_g"), explode(col("grams")).as("g"))
    // document frequency per (block, gram) — the global prefix order. The
    // partial-agg shuffle carries one row per DISTINCT gram, not per
    // occurrence; the df-1 filter happens on the AGGREGATED side, so the
    // inner join below drops never-colliding grams during the join itself.
    val dfreq = exploded.groupBy("blk", "g").agg(count(lit(1)).as("gdf"))
      .filter(col("gdf") >= 2)
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy("blk", "nj_id")
    // Ranks must cover the doc's FULL gram set (ranking a reduced set would
    // pull stop-grams into short effective prefixes), but df-1 grams all
    // carry the globally smallest key (gdf = 1), so they sort strictly
    // first: the full-set rank of a shared gram is (#df-1 grams) + (rank
    // among shared grams) = (n_g − n2) + rk2 — computable after dropping
    // the df-1 rows. One doc-keyed exchange serves both window functions.
    val ranked = exploded.join(dfreq, Seq("blk", "g"))
      .withColumn("n2", count(lit(1)).over(byDoc))
      .withColumn("rk2", row_number().over(byDoc.orderBy(col("gdf"), col("g"))))
    // α = ⌈t·|A|⌉; the 1e-9 guard keeps FP noise from inflating an exact
    // integer t·|A| (which would SHORTEN the prefix and lose pairs —
    // rounding the other way only admits extra candidates).
    val prefLen = (col("n_g") - ceil(col("n_g") * threshold - lit(1e-9)) + 1).cast("int")
    // ONE persisted frame serves as both the probe side (__pref rows) and
    // the asymmetric full-index side; gdf rides along so hot-key salting
    // is an inline column computation — no histogram job, no broadcast.
    val pruned = graft.CachePool.persist(
      ranked.select(col("blk"), col("g"), col("nj_id"), col("gdf"),
        ((col("n_g") - col("n2") + col("rk2")) <= prefLen).as("__pref")))

    if (symmetric) {
      // Inline triangle tiling (the boundedSelfPairs shape, but with S
      // derived from the gdf column already on every row instead of a
      // histogram job + broadcast): a gram hot enough that its prefix
      // rows could swamp one task splits into S = ⌈gdf/threshold⌉ groups,
      // each (i ≤ j) group-pair its own join cell. gdf ≥ the prefix row
      // count, so S only ever over-tiles — per-task work stays bounded,
      // pair coverage is exact, and a cold gram (S = 1) degenerates to
      // the plain single-cell self-join with zero replication.
      val s = ceil(col("gdf").cast("double") / hotGramThreshold).cast("int")
      val withG = pruned.filter(col("__pref"))
        .withColumn("__s", s)
        .withColumn("__g", pmod(xxhash64(col("nj_id")), col("__s").cast("long")).cast("int"))
      val aSide = withG.select(col("blk"), col("g"), col("__g").as("__c1"),
        explode(sequence(col("__g"), col("__s") - 1)).as("__c2"),
        col("nj_id").as("id_a"))
      val bSide = withG.select(col("blk"), col("g"),
        explode(sequence(lit(0), col("__g"))).as("__c1"), col("__g").as("__c2"),
        col("nj_id").as("id_b"))
      aSide.join(bSide, Seq("blk", "g", "__c1", "__c2"))
        .filter(col("__c1") < col("__c2") || col("id_a") < col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct()
    } else {
      // gdf is the EXACT full-side row count for the gram (every df≥2 row
      // survives the prune), so salting needs no separate count pass: a
      // gram with gdf > hotGramThreshold splits into S = ⌈gdf/threshold⌉
      // salt cells — probe rows replicate S ways, index rows hash into
      // them — and a cold gram (S = 1) takes the identical plan with zero
      // replication. Per-task candidate work stays bounded by
      // p_g × hotGramThreshold no matter how common the gram is.
      val salts = ceil(col("gdf").cast("double") / hotGramThreshold).cast("int")
      val probe = pruned.filter(col("__pref"))
        .select(col("blk"), col("g"), col("nj_id").as("id_p"),
          explode(sequence(lit(0), salts - 1)).as("__c"))
      val full = pruned.select(col("blk"), col("g"), col("nj_id").as("id_f"),
        pmod(xxhash64(col("nj_id")), salts.cast("long")).cast("int").as("__c"))
      probe.join(full, Seq("blk", "g", "__c"))
        .filter(col("id_p") =!= col("id_f"))
        .select(least(col("id_p"), col("id_f")).as("id_a"),
          greatest(col("id_p"), col("id_f")).as("id_b"))
        .distinct()
    }
  }

  /** The shared pair core: (id_a, id_b, n_shared, n_a, n_b) for every
    * PREFIX-SURVIVING intra-block pair — a superset of the qualifying
    * pairs (the prefix lemma guarantees no qualifying pair is pruned), so
    * the caller's threshold filter yields exactly the same rows as an
    * all-pairs evaluation. Counts come from one native sorted-merge
    * intersect per candidate over the persisted gram arrays: the same
    * integers (and therefore the same IEEE divisions) as the exact
    * per-pair form, bit-for-bit.
    */
  private def gramPairCounts(docs: DataFrame, id: Column, text: Column, block: Column,
                             n: Int, threshold: Double, symmetric: Boolean,
                             hotGramThreshold: Int): DataFrame = {
    // persist: candidate generation explodes this frame several times and
    // the verification joins re-read the arrays; without the boundary the
    // tokenize→hash pipeline re-runs per consumer.
    val sets = graft.CachePool.persist(gramSets(docs, id, text, block, n))
    val verifyA = sets.select(col("nj_id").as("id_a"), col("grams").as("__ga"))
    val verifyB = sets.select(col("nj_id").as("id_b"), col("grams").as("__gb"))
    candidatePairs(sets, threshold, symmetric, hotGramThreshold)
      .join(verifyA, "id_a")
      .join(verifyB, "id_b")
      .select(col("id_a"), col("id_b"),
        TextHashExprs.sortedIntersectCount(col("__ga"), col("__gb")).as("n_shared"),
        size(col("__ga")).as("n_a"), size(col("__gb")).as("n_b"))
  }

  /** Intra-block pairs where either direction's containment ≥ threshold
    * (idA < idB; both directions reported). Result values are identical to
    * the all-pairs sorted-merge form — `count(shared grams) / |A|` is the
    * same integer-over-integer division.
    */
  def containmentPairs(docs: DataFrame, id: Column, text: Column, block: Column,
                       n: Int = 3, threshold: Double = 0.8,
                       hotGramThreshold: Int = 4096): DataFrame =
    gramPairCounts(docs, id, text, block, n, threshold, symmetric = false, hotGramThreshold)
      .select(col("id_a"), col("id_b"),
        (col("n_shared").cast("double") / col("n_a")).as("c_ab"),
        (col("n_shared").cast("double") / col("n_b")).as("c_ba"))
      .filter(col("c_ab") >= threshold || col("c_ba") >= threshold)
      .orderBy("id_a", "id_b")

  /** Exact Jaccard for every intra-block pair (idA < idB) with similarity
    * ≥ threshold, over the prefix-filtered pair core: J = |A∩B| / |A∪B|
    * with the intersection from one sorted-merge per surviving candidate
    * and the union derived as n_a + n_b − n_shared. Values are
    * bit-identical to a per-pair sorted-merge over all pairs (same integer
    * intersection, same IEEE division); the candidate join shuffles 8-byte
    * prefix-gram rows only, pairs sharing no gram never form at all, and
    * pairs sharing only high-df grams are pruned by the prefix lemma
    * before any set operation runs.
    */
  def blockedPairs(docs: DataFrame, id: Column, text: Column, block: Column,
                   n: Int = 3, threshold: Double = 0.5,
                   hotGramThreshold: Int = 4096): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0)
    gramPairCounts(docs, id, text, block, n, threshold, symmetric = true, hotGramThreshold)
      .select(col("id_a"), col("id_b"),
        (col("n_shared").cast("double") / (col("n_a") + col("n_b") - col("n_shared")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }
}
