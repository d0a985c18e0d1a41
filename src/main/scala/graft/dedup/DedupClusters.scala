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
    // Lineage is TRUNCATED each round (eager localCheckpoint): an
    // iterative plan otherwise nests the whole upstream plan once per
    // round, and driver-side canonicalization / cache lookup over the
    // deepening tree quickly dwarfs the actual (tiny) shuffles. This is
    // the standard shape for iterative DataFrame algorithms; at cluster
    // scale, swap localCheckpoint for reliable checkpointing if
    // executor-loss fault tolerance matters mid-computation.
    // Checkpointed round frames are dropped by the ContextCleaner as
    // soon as the next round stops referencing them.
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .distinct().localCheckpoint(true)
    var comp = edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")).localCheckpoint(true)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      // neighbor-min step: label := min(own, neighbors')
      val nbrMin = edges
        .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy("src").agg(min("ncomp").as("nmin"))
      // checkpointed: the pointer-jump reads stepped on BOTH join sides
      val stepped = comp
        .join(nbrMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("mid"),
          col("comp").as("prev"))
        .localCheckpoint(true)
      // pointer-jump step: label := label(label) — a label is always a
      // live vertex id, so the lookup is an equi-join against the same
      // frame, and jumping halves the remaining chain length per round
      // (O(log diameter) rounds instead of O(diameter)).
      val next = stepped
        .join(stepped.select(col("id").as("mid"), col("mid").as("jump")), Seq("mid"))
        .select(col("id"), least(col("mid"), col("jump")).as("comp"),
          (least(col("mid"), col("jump")) < col("prev")).as("__moved"))
        .localCheckpoint(true)
      changed = next.agg(coalesce(max(col("__moved")), lit(false)))
        .collect()(0).getBoolean(0)
      comp = next.select("id", "comp")
      iter += 1
    }
    comp
  }

  /** The adversarial-graph alternative: two-phase star contraction
    * (the large-star/small-star algorithm of Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14). Min-label
    * propagation with pointer jumping ([[components]]) needs O(log d)
    * rounds for diameter d — fine for dup graphs (tiny cliques/chains),
    * but a corpus-length chain is O(log n) rounds EACH costing a join
    * over the full vertex set. Star contraction converges in O(log² n)
    * rounds on any graph while shrinking the edge set geometrically:
    *
    *  - large-star: every node points its LARGER neighbors at its
    *    min-neighborhood label m = min(Γ(u) ∪ u);
    *  - small-star: every node points its smaller-or-equal neighbors
    *    (and itself) at m.
    *
    * Each phase is one groupBy + one join on the (shrinking) edge list.
    * At fixpoint the edge list IS the component map: (u → component
    * min) for every non-root u. Output matches [[components]] row for
    * row (roots carry comp = id).
    */
  def componentsStarContraction(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    val initial = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(true)
    val vertices = initial.select(col("u").as("id"))
      .unionByName(initial.select(col("v").as("id")))
      .distinct().localCheckpoint(true)

    // large-star: from each node's FULL (symmetrized) neighborhood,
    // point every strictly-larger neighbor at m = min(Γ(u) ∪ u).
    def largeStar(e: DataFrame): DataFrame = {
      val adj = e.unionByName(e.select(col("v").as("u"), col("u").as("v"))).distinct()
      val m = adj.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      adj.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }

    // small-star: orient each edge from its larger endpoint, point the
    // smaller neighbors AND the node itself at m = min(N⁻(u) ∪ u).
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")).distinct()
      val m = oriented.groupBy("u").agg(min("v").as("m"))
      oriented.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }

    var edges = initial
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val next = smallStar(largeStar(edges)).localCheckpoint(true)
      // fixpoint ⇔ identical edge sets (both are distinct): same size and
      // nothing new on either side. Two cheap anti-join probes.
      changed = next.join(edges, Seq("u", "v"), "left_anti").head(1).nonEmpty ||
        edges.join(next, Seq("u", "v"), "left_anti").head(1).nonEmpty
      edges = next
      iter += 1
    }
    // fixpoint stars: every non-root points at exactly its component's
    // min (roots carry no outgoing edge — their self-loop dropped).
    val labels = edges.groupBy("u").agg(min("v").as("comp"))
      .select(col("u").as("id"), col("comp"))
    vertices.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** One row per cluster: (comp, n_members) — the dedup survivor is the
    * representative `comp` itself (min id, matching ExactDedup's keep-min
    * convention).
    */
  def clusterSizes(pairs: DataFrame, maxIter: Int = 20): DataFrame =
    components(pairs, maxIter)
      .groupBy("comp").agg(count(lit(1)).as("n_members"))
}
