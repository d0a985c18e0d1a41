package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Embedding-space topic clustering — the corpus-organization step that
  * groups documents by semantic neighborhood (mixture balancing, topic
  * quotas, curriculum ordering all consume these labels). Reuses the ANN
  * family's machinery end to end: the centroids are [[IvfKnn.fit]]'s
  * sample-trained seeded k-means quantizer (fit once on a bounded sample,
  * driver-local, the standard index-build shape), and assignment is
  * [[IvfKnn.nearestCells]]'s argmax-of-cosine — a pure map over the
  * corpus, no shuffle until the per-cluster aggregate.
  */
object TopicClusters {

  /** (vec_id, cluster) for every vector: nearest centroid by cosine. */
  def assign(vecs: DataFrame, id: Column, emb: Column,
             index: IvfKnn.IvfIndex): DataFrame =
    vecs.select(id.as("vec_id"),
      IvfKnn.nearestCells(emb, index, 1).getItem(0).as("cluster"))

  /** Per-cluster sizes over a fresh seeded fit. */
  def clusterSizes(vecs: DataFrame, id: Column, emb: Column, k: Int,
                   seed: Long = 42L): DataFrame =
    assign(vecs, id, emb, IvfKnn.fit(vecs.select(emb.as("embedding")), k, seed))
      .groupBy("cluster").agg(count(lit(1)).as("n_vecs"))
      .orderBy("cluster")

  /** Driver-graded clustering gate, in the recall-gate idiom: cluster ids
    * and sizes are fit-specific (no external engine can replay seeded
    * k-means), so the graded row is integers any engine can derive plus
    * pinned booleans:
    *  - `n_vecs` — corpus size (data-derived);
    *  - `complete_ok` — every vector got exactly one label and none were
    *    lost in the assign/aggregate plumbing (Σ sizes = n_vecs);
    *  - `used_ok` — 1 ≤ #nonempty clusters ≤ k;
    *  - `inertia_ok` — the REAL quality signal: mean cosine distance to
    *    the assigned centroid beats the 1-cluster baseline (mean distance
    *    to the corpus's global mean direction). Both means are double
    *    sums whose partition order varies, but the clustering/baseline
    *    gap is orders of magnitude above summation jitter, the same
    *    stability argument as the ANN recall gates.
    */
  def clusterGate(vecs: DataFrame, id: Column, emb: Column, k: Int,
                  seed: Long = 42L): DataFrame = {
    val corpus = graft.CachePool.persist(
      vecs.select(id.as("vec_id"), emb.cast("array<float>").as("embedding")))
    val n = corpus.count()
    if (n == 0L) {
      // nothing to cluster: every invariant holds vacuously
      import vecs.sparkSession.implicits._
      return Seq((k.toLong, 0L, true, true, true))
        .toDF("k", "n_vecs", "complete_ok", "used_ok", "inertia_ok")
    }
    val index = IvfKnn.fit(corpus, k, seed, corpusCount = Some(n))
    // global mean direction: per-dimension average, a bounded (dim-sized)
    // driver read — the k = 1 "index"
    val dim = index.centroids.headOption.map(_.length).getOrElse(0)
    val mean = corpus
      .select(posexplode(col("embedding")).as(Seq("pos", "x")))
      .groupBy("pos").agg(avg("x").as("m"))
      .orderBy("pos").collect().map(_.getDouble(1).toFloat)
    require(mean.length == dim || dim == 0, s"dim mismatch: ${mean.length} vs $dim")
    val gnorm = math.sqrt(mean.map(x => x.toDouble * x).sum)
    val ghat = mean.map(x => if (gnorm == 0) 0.0f else (x / gnorm).toFloat)

    val scored = corpus.select(
      col("vec_id"),
      IvfKnn.nearestCells(col("embedding"), index, 1).getItem(0).as("cluster"),
      VecOps.normF(col("embedding")).as("n"),
      col("embedding"))
    // centroids are unit vectors, so dot/|x| IS the cosine; the best-cell
    // cosine is recomputed as greatest(dots)/|x| off the same centroids
    // (greatest needs ≥ 2 args — with one centroid its dot is the max)
    val dots = index.centroids.map(c =>
      VecOps.dotF(col("embedding"), VecOps.litVecF(c))).toIndexedSeq
    val bestDot = if (dots.length == 1) dots.head else greatest(dots: _*)
    val cellCos = bestDot / col("n")
    val baseCos = VecOps.dotF(col("embedding"), VecOps.litVecF(ghat)) / col("n")
    val agg = scored
      .select(col("cluster"), cellCos.as("cc"), baseCos.as("bc"))
      .agg(
        count(lit(1)).as("n_vecs"),
        count_distinct(col("cluster")).as("used"),
        avg(lit(1.0) - col("cc")).as("intra"),
        avg(lit(1.0) - col("bc")).as("base"))
    val sizesSum = scored.groupBy("cluster").agg(count(lit(1)).as("ns"))
      .agg(coalesce(sum("ns"), lit(0L)).as("sum_sizes"))
    agg.crossJoin(broadcast(sizesSum)).select(
      lit(k.toLong).as("k"),
      col("n_vecs"),
      (col("sum_sizes") === col("n_vecs")).as("complete_ok"),
      (col("used") >= 1 && col("used") <= k).as("used_ok"),
      (col("intra") < col("base")).as("inertia_ok"))
  }
}
