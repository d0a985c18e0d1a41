package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair list — the step that
  * turns pairwise similarity into dedup GROUPS (transitive closure): A≈B
  * and B≈C must dedup as one cluster {A,B,C} even when A and C never
  * formed a pair.
  *
  * Algorithm: iterative min-label propagation as pure DataFrame rounds —
  * every vertex starts labeled with its own id, and each round takes the
  * min of its label and its neighbors' labels; at fixpoint every vertex
  * carries the minimum id reachable in its component (a deterministic
  * canonical representative). Rounds are bounded by component DIAMETER,
  * and near-duplicate graphs are overwhelmingly tiny cliques and short
  * chains — 2-4 rounds in practice; `maxIter` caps the worst case. Each
  * round is one equi-join + partial-agg shuffle on the 8-byte vertex id
  * (no driver-side graph state; the edge list never leaves executors).
  * For adversarial high-diameter graphs (long chains at the scale of the
  * corpus), switch to the large-star/small-star contraction, which
  * converges in O(log²) rounds on the same join shape.
  */
object DedupClusters {

  /** (id, comp) for every vertex in `pairs` (columns id_a, id_b), where
    * comp = min id in the vertex's connected component.
    */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = graft.CachePool.persist(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct())
    var comp = graft.CachePool.persist(
      edges.select(col("src").as("id")).distinct().withColumn("comp", col("id")))
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val nbrMin = edges
        .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy("src").agg(min("ncomp").as("nmin"))
      val next = graft.CachePool.persist(
        comp.join(nbrMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
          .select(col("id"),
            least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp")))
      // one tiny action per round: did any label move? (labels only ever
      // decrease, so equality of SUM is equality of labels)
      changed = next.join(comp.withColumnRenamed("comp", "prev"), "id")
        .filter(col("comp") =!= col("prev"))
        .limit(1).count() > 0
      comp = next
      iter += 1
    }
    comp
  }

  /** One row per cluster: (comp, n_members) — the dedup survivor is the
    * representative `comp` itself (min id, matching ExactDedup's keep-min
    * convention).
    */
  def clusterSizes(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    components(pairs, maxIter)
      .groupBy("comp").agg(count(lit(1)).as("n_members"))
}
