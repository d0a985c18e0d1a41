package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.DedupClusters
import graft.functions.VecOps
import graft.plans.TopKPerKey

/** SemDeDup — semantic deduplication in embedding space (Abbas et al.,
  * "SemDeDup: Data-efficient learning at web-scale through semantic
  * deduplication", 2023): cluster the corpus with a sample-trained k-means,
  * form pairs ONLY within a cluster, connect pairs whose cosine exceeds a
  * threshold into duplicate groups, and keep one survivor per group — the
  * member LEAST similar to its cluster centroid (the paper's "keep the
  * least prototypical example" policy; ties break on vec_id, so
  * identical-direction copies keep the smallest id).
  *
  * This composes machinery that is each already bounded at 100 TB:
  *  - the quantizer is [[IvfKnn.fit]]'s driver-local seeded k-means over a
  *    bounded sample (zero Spark jobs); assignment is a pure map — the
  *    corpus does not shuffle to get its cluster label;
  *  - within-cluster pair generation routes through
  *    [[graft.operators.SkewJoin.boundedSelfPairs]] on the cluster key:
  *    k-means clusters are FAT keys by construction (n/k rows each), the
  *    exact input class the triangle tiling exists for — no task ever owns
  *    a cluster's quadratic pair work, and the exact-cosine confirm runs
  *    once per candidate pair off the riding (embedding, norm) payload;
  *  - duplicate groups close with [[DedupClusters.components]] (min-label +
  *    pointer jumping, throws on non-convergence);
  *  - the survivor argmin runs through [[TopKPerKey]]'s bounded heaps —
  *    ≤ 1 row per component per map task reaches the exchange.
  *
  * Reference scope note: the reference pipeline (dags/main.py) has no
  * embedding operators; this extends the LLM-data-pipeline surface
  * (SURVEY §2.2) alongside the MinHash/SimHash/LSH dedup family.
  */
object SemDeDup {

  /** Corpus with cluster label and centroid cosine attached — one pure map
    * over the corpus (the [[TopicClusters.assign]] shape plus the policy
    * column): `(vec_id, cluster, cent_cos, embedding, nrm)`. Centroids are
    * unit vectors, so the assigned-centroid cosine is greatest(dot)/|x|
    * off the same broadcast centroid literals the assignment uses.
    */
  def assignWithCentroidCos(vecs: DataFrame, id: Column, emb: Column,
                            index: IvfKnn.IvfIndex): DataFrame = {
    val corpus = vecs.select(id.as("vec_id"),
      emb.cast("array<float>").as("embedding"))
    val dots = index.centroids.map(c =>
      VecOps.dotF(col("embedding"), VecOps.litVecF(c))).toIndexedSeq
    val bestDot = if (dots.length == 1) dots.head else greatest(dots: _*)
    corpus.select(
      col("vec_id"),
      IvfKnn.nearestCells(col("embedding"), index, 1).getItem(0).as("cluster"),
      (bestDot / VecOps.normF(col("embedding"))).as("cent_cos"),
      col("embedding"),
      VecOps.normF(col("embedding")).as("nrm"))
  }

  /** Within-cluster pairs (vec_a < vec_b) with cosine above `threshold`.
    * Input must carry (cluster, vec_id, embedding, nrm).
    */
  def semanticPairs(assigned: DataFrame, threshold: Double,
                    hotClusterThreshold: Int = 4096): DataFrame =
    graft.operators.SkewJoin.boundedSelfPairs(
        assigned.select(col("cluster"), col("vec_id"),
          struct(col("embedding").as("emb"), col("nrm")).as("pay")),
        Seq("cluster"), col("vec_id"), col("pay"), hotClusterThreshold)
      .filter((VecOps.dotF(col("pay_a.emb"), col("pay_b.emb"))
        / (col("pay_a.nrm") * col("pay_b.nrm"))) > lit(threshold))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))

  /** Surviving vec_ids after semantic dedup: unclustered vectors survive
    * as themselves; each duplicate group keeps its argmin-(cent_cos,
    * vec_id) member. Ordered by vec_id.
    */
  def survivors(vecs: DataFrame, id: Column, emb: Column, k: Int,
                threshold: Double, seed: Long = 42L,
                hotClusterThreshold: Int = 4096): DataFrame = {
    val corpus = graft.CachePool.persist(
      vecs.select(id.as("vec_id"), emb.cast("array<float>").as("embedding")))
    val index = IvfKnn.fit(corpus, k, seed)
    val assigned = graft.CachePool.persist(
      assignWithCentroidCos(corpus, col("vec_id"), col("embedding"), index))
    val pairs = semanticPairs(assigned, threshold, hotClusterThreshold)
    val labels = DedupClusters.components(
      pairs.select(col("vec_a").as("id_a"), col("vec_b").as("id_b")))
    val member = assigned.join(labels, assigned("vec_id") === labels("id"), "left")
    val winners = TopKPerKey.topK(
        member.filter(col("comp").isNotNull)
          .select(col("comp"), col("vec_id"), col("cent_cos")),
        Seq("comp"), Seq(("cent_cos", true), ("vec_id", true)), 1)
      .select("vec_id")
    member.filter(col("comp").isNull).select("vec_id")
      .unionByName(winners)
      .orderBy("vec_id")
  }

  /** Driver-graded gate in the recall-gate idiom (seeded k-means is not
    * oracle-replayable): run semantic dedup over a corpus with planted
    * scaled copies (same direction ⇒ cosine 1 ⇒ same cluster, same
    * centroid cosine) and emit data-derived integers + pinned booleans:
    *  - `n_vecs` / `n_planted` — corpus and planted-copy counts;
    *  - `planted_resolved_ok` — ≥ 90% of planted (original, copy) pairs
    *    resolve to EXACTLY one survivor (a pair can under-resolve only by
    *    merging into a larger organic duplicate group);
    *  - `originals_survive_ok` — no resolved pair kept the copy: equal
    *    direction means equal centroid cosine, so the vec_id tie-break
    *    must keep the original (this pins the policy's determinism);
    *  - `no_dup_survivors_ok` — no above-threshold pair has BOTH sides
    *    surviving (the paper's guarantee, asserted end-to-end).
    */
  def semDedupGate(vecs: DataFrame, id: Column, emb: Column, k: Int,
                   threshold: Double, plantedOffset: Long,
                   seed: Long = 42L): DataFrame = {
    val corpus = graft.CachePool.persist(
      vecs.select(id.as("vec_id"), emb.cast("array<float>").as("embedding")))
    val index = IvfKnn.fit(corpus, k, seed)
    val assigned = graft.CachePool.persist(
      assignWithCentroidCos(corpus, col("vec_id"), col("embedding"), index))
    val pairs = graft.CachePool.persist(semanticPairs(assigned, threshold))
    val labels = DedupClusters.components(
      pairs.select(col("vec_a").as("id_a"), col("vec_b").as("id_b")))
    val member = assigned.join(labels, assigned("vec_id") === labels("id"), "left")
    val winners = TopKPerKey.topK(
        member.filter(col("comp").isNotNull)
          .select(col("comp"), col("vec_id"), col("cent_cos")),
        Seq("comp"), Seq(("cent_cos", true), ("vec_id", true)), 1)
      .select("vec_id")
    val surv = graft.CachePool.persist(
      member.filter(col("comp").isNull).select("vec_id").unionByName(winners))

    val planted = corpus.filter(col("vec_id") >= plantedOffset)
      .select((col("vec_id") - plantedOffset).as("orig"), col("vec_id").as("copy"))
    val sOrig = surv.select(col("vec_id").as("orig")).withColumn("o_in", lit(1))
    val sCopy = surv.select(col("vec_id").as("copy")).withColumn("c_in", lit(1))
    val pairStatus = planted
      .join(sOrig, Seq("orig"), "left").join(sCopy, Seq("copy"), "left")
      .select((coalesce(col("o_in"), lit(0)) + coalesce(col("c_in"), lit(0))).as("n_in"),
        coalesce(col("c_in"), lit(0)).as("c_in"),
        coalesce(col("o_in"), lit(0)).as("o_in"))
      .agg(
        count(lit(1)).as("n_planted"),
        sum(when(col("n_in") === 1, 1L).otherwise(0L)).as("n_resolved"),
        sum(when(col("n_in") === 1 && col("c_in") === 1, 1L).otherwise(0L))
          .as("n_copy_kept"))
    val bothSurvive = pairs
      .join(surv.select(col("vec_id").as("vec_a")), Seq("vec_a"))
      .join(surv.select(col("vec_id").as("vec_b")), Seq("vec_b"))
      .agg(count(lit(1)).as("n_both"))
    val nVecs = corpus.agg(count(lit(1)).as("n_vecs"))
    pairStatus.crossJoin(broadcast(bothSurvive)).crossJoin(broadcast(nVecs))
      .select(
        lit(k.toLong).as("k"),
        col("n_vecs"),
        col("n_planted").cast("long").as("n_planted"),
        (col("n_resolved") * lit(10L) >= col("n_planted") * lit(9L))
          .as("planted_resolved_ok"),
        (col("n_copy_kept") === 0L).as("originals_survive_ok"),
        (col("n_both") === 0L).as("no_dup_survivors_ok"))
  }
}
