package graft.dedup

import org.apache.spark.internal.Logging
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
  * corpus), [[componentsStarContraction]] (large-star/small-star)
  * converges in O(log² n) rounds on the same join shape, and
  * [[componentsAuto]] escalates from one to the other automatically.
  *
  * Every variant takes `checkpointDir`: `None` truncates per-round
  * lineage with eager `localCheckpoint` (executor-local blocks — fast,
  * but a lost executor kills the job), `Some(dir)` uses RELIABLE
  * `checkpoint()` into that directory so a 100 TB clustering job
  * survives executor loss mid-iteration. Same results either way.
  */
object DedupClusters extends Logging {

  /** Per-round lineage truncation: an iterative plan otherwise nests the
    * whole upstream plan once per round, and driver-side canonicalization
    * over the deepening tree quickly dwarfs the actual (tiny) shuffles.
    * Checkpointed round frames are dropped by the ContextCleaner as soon
    * as the next round stops referencing them.
    */
  private def truncate(df: DataFrame, checkpointDir: Option[String]): DataFrame =
    checkpointDir match {
      case Some(_) => df.checkpoint(eager = true)
      case None    => df.localCheckpoint(eager = true)
    }

  private def setDir(df: DataFrame, checkpointDir: Option[String]): Unit =
    checkpointDir.foreach(df.sparkSession.sparkContext.setCheckpointDir)

  /** Min-label + pointer-jump rounds; returns the labels and whether the
    * fixpoint was reached within `maxIter`.
    */
  private def minLabelRounds(pairs: DataFrame, maxIter: Int,
                             checkpointDir: Option[String]): (DataFrame, Boolean) = {
    setDir(pairs, checkpointDir)
    val edges = truncate(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionByName(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct(), checkpointDir)
    var comp = truncate(edges.select(col("src").as("id")).distinct()
      .withColumn("comp", col("id")), checkpointDir)
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      // neighbor-min step: label := min(own, neighbors')
      val nbrMin = edges
        .join(comp.select(col("id").as("dst"), col("comp").as("ncomp")), "dst")
        .groupBy("src").agg(min("ncomp").as("nmin"))
      // checkpointed: the pointer-jump reads stepped on BOTH join sides
      val stepped = truncate(comp
        .join(nbrMin.select(col("src").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("comp"), coalesce(col("nmin"), col("comp"))).as("mid"),
          col("comp").as("prev")), checkpointDir)
      // pointer-jump step: label := label(label) — a label is always a
      // live vertex id, so the lookup is an equi-join against the same
      // frame, and jumping halves the remaining chain length per round
      // (O(log diameter) rounds instead of O(diameter)).
      val next = truncate(stepped
        .join(stepped.select(col("id").as("mid"), col("mid").as("jump")), Seq("mid"))
        .select(col("id"), least(col("mid"), col("jump")).as("comp"),
          (least(col("mid"), col("jump")) < col("prev")).as("__moved")), checkpointDir)
      changed = next.agg(coalesce(max(col("__moved")), lit(false)))
        .collect()(0).getBoolean(0)
      comp = next.select("id", "comp")
      iter += 1
    }
    (comp, !changed)
  }

  /** (id, comp) for every vertex in `pairs` (columns id_a, id_b), where
    * comp = min id in the vertex's connected component. Throws if the
    * fixpoint is not reached within `maxIter` — a truncated label map is
    * silently WRONG (vertices still carry non-minimal labels), never an
    * approximation; raise `maxIter` or use [[componentsAuto]].
    */
  def components(pairs: DataFrame, maxIter: Int = 20,
                 checkpointDir: Option[String] = None): DataFrame = {
    val (comp, converged) = minLabelRounds(pairs, maxIter, checkpointDir)
    if (!converged) throw new IllegalStateException(
      s"DedupClusters.components did not converge within maxIter=$maxIter rounds; " +
        "labels would be non-minimal. Raise maxIter or use componentsAuto.")
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
    * row (roots carry comp = id). Throws when the fixpoint is not
    * reached within `maxIter`: this variant exists precisely for the
    * high-diameter graphs where convergence is slowest, so silent
    * truncation would yield wrong labels exactly on its target inputs.
    */
  def componentsStarContraction(pairs: DataFrame, maxIter: Int = 50,
                                checkpointDir: Option[String] = None): DataFrame =
    starContractionCounted(pairs, maxIter, checkpointDir)._1

  /** [[componentsStarContraction]] plus the number of contraction rounds
    * executed (including the final fixpoint-confirming round — the loop
    * counts every `smallStar(largeStar(_))` application). Exposed for the
    * adversarial-scale gate, whose oracle replays the same rounds.
    */
  private[graft] def starContractionCounted(
      pairs: DataFrame, maxIter: Int = 50,
      checkpointDir: Option[String] = None): (DataFrame, Int) = {
    setDir(pairs, checkpointDir)
    val initial = truncate(pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .filter(col("u") =!= col("v")).distinct(), checkpointDir)
    val vertices = truncate(initial.select(col("u").as("id"))
      .unionByName(initial.select(col("v").as("id")))
      .distinct(), checkpointDir)

    // large-star: from each node's FULL (symmetrized) neighborhood,
    // point every strictly-larger neighbor at m = min(Γ(u) ∪ u).
    // Per-round exchange budget (r19): the symmetrized adjacency is NOT
    // distinct'ed — duplicates cannot change m (min is duplicate-
    // insensitive) nor the output SET (the trailing distinct collapses
    // join fan-out), and that distinct was a full exchange over 2|E|
    // rows. The aggregate's partial-agg exchange and AQE's runtime
    // broadcast of the tiny m frame stay as they were (an explicit
    // repartition was A/B'd and LOST — it defeats the broadcast). Each
    // round's edge SET is bit-identical to the textbook form — the
    // fixpoint index (which q_closure_scale's oracle replays) cannot
    // move.
    def largeStar(e: DataFrame): DataFrame = {
      val adj = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val m = adj.groupBy("u").agg(least(min("v"), first("u")).as("m"))
      adj.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }

    // small-star: orient each edge from its larger endpoint, point the
    // smaller neighbors AND the node itself at m = min(N⁻(u) ∪ u).
    // Called only on largeStar output, where every edge already points
    // strictly large→small and the set is distinct — so the textbook
    // greatest/least orientation is the identity and its distinct (a
    // full exchange over |E|) is a no-op; both dropped (r19). The
    // output SET is unchanged.
    def smallStar(e: DataFrame): DataFrame = {
      val oriented = e
      val m = oriented.groupBy("u").agg(min("v").as("m"))
      oriented.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }

    var edges = initial
    var edgeCount = edges.count()
    var iter = 0
    var changed = true
    while (changed && iter < maxIter) {
      val next = truncate(smallStar(largeStar(edges)), checkpointDir)
      // fixpoint ⇔ identical edge sets (both are distinct). A differing
      // COUNT already proves the sets differ — and the edge set shrinks
      // on almost every contraction round — so the expensive
      // symmetric-difference probe (full outer join) only runs on the
      // final same-count rounds; every other round pays one cheap count
      // of an already-persisted frame.
      val nextCount = next.count()
      changed = nextCount != edgeCount ||
        next.withColumn("__n", lit(1))
          .join(edges.withColumn("__e", lit(1)), Seq("u", "v"), "full_outer")
          .filter(col("__n").isNull || col("__e").isNull)
          .head(1).nonEmpty
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (changed) throw new IllegalStateException(
      s"DedupClusters.componentsStarContraction did not converge within " +
        s"maxIter=$maxIter rounds; labels would be wrong. Raise maxIter.")
    // fixpoint stars: every non-root points at exactly its component's
    // min (roots carry no outgoing edge — their self-loop dropped).
    val labels = edges.groupBy("u").agg(min("v").as("comp"))
      .select(col("u").as("id"), col("comp"))
    (vertices.join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp")), iter)
  }

  /** Auto-selecting entry point: run min-label + pointer-jump for up to
    * `propagationBudget` rounds (2-4 suffice on real dup graphs — tiny
    * cliques and short chains), and ESCALATE to star contraction if the
    * fixpoint is not reached — the budget doubling as the diameter
    * heuristic: a graph that hasn't converged in b pointer-jumping
    * rounds has effective diameter ≳ 2^b, exactly star contraction's
    * target class. Both phases are equi-join rounds over the edge list;
    * the escalation wastes only the budgeted rounds.
    */
  def componentsAuto(pairs: DataFrame, propagationBudget: Int = 8,
                     maxIter: Int = 50,
                     checkpointDir: Option[String] = None): DataFrame =
    componentsAutoCounted(pairs, propagationBudget, maxIter, checkpointDir)._1

  /** [[componentsAuto]] plus the escalation decision and star round count
    * (0 when propagation converged within budget) — the instrumented form
    * the adversarial-scale gate grades.
    */
  private[graft] def componentsAutoCounted(
      pairs: DataFrame, propagationBudget: Int = 8, maxIter: Int = 50,
      checkpointDir: Option[String] = None): (DataFrame, Boolean, Int) = {
    val (comp, converged) = minLabelRounds(pairs, propagationBudget, checkpointDir)
    if (converged) (comp, false, 0)
    else {
      logWarning(s"componentsAuto: min-label propagation not converged after " +
        s"$propagationBudget rounds (effective diameter ≳ ${1L << propagationBudget}); " +
        "escalating to star contraction")
      val (labels, rounds) = starContractionCounted(pairs, maxIter, checkpointDir)
      (labels, true, rounds)
    }
  }

  /** One row per cluster: (comp, n_members) — the dedup survivor is the
    * representative `comp` itself (min id, matching ExactDedup's keep-min
    * convention).
    */
  def clusterSizes(pairs: DataFrame, maxIter: Int = 20,
                   checkpointDir: Option[String] = None): DataFrame =
    components(pairs, maxIter, checkpointDir)
      .groupBy("comp").agg(count(lit(1)).as("n_members"))
}
