package graft.etl

import org.apache.spark.sql.functions._
import org.scalatest.prop.TableDrivenPropertyChecks

import graft.SparkSpec

/** Temperature mixing (Sampling.temperatureTargets / temperatureMix) and
  * the topic-cluster gate.
  */
class MixSpec extends SparkSpec with TableDrivenPropertyChecks {
  import spark.implicits._

  private def docsFrom(counts: Map[String, Int]) = {
    val rows = counts.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (0 until n).map(i => (s"$s-$i".hashCode.toLong << 8 | i, s))
    }.zipWithIndex.map { case ((_, s), i) => (i.toLong, s) }
    rows.toDF("doc_id", "source")
  }

  test("temperatureTargets: hand-computed Hamilton allocation") {
    // n = {a: 4, b: 1} → w̃ = {2·2^20, 1·2^20}, W = 3·2^20. T = 3:
    // base_a = (3·2w)/(3w) = 2 rem 0; base_b = 1 rem 0; deficit 0.
    val docs = docsFrom(Map("a" -> 4, "b" -> 1))
    val got = Sampling.temperatureTargets(docs, col("source"), lit(3L))
      .as[(String, Long, Long)].collect().toList
    assert(got === List(("a", 4L, 2L), ("b", 1L, 1L)))
  }

  test("unimaxTargets: hand-computed waterfill with cap and share branches") {
    // per-doc token counts: a has 2 docs x 5 tok, b has 1 doc x 40 tok,
    // c has 1 doc x 50 tok -> n = {a:10, b:40, c:50}, total 100.
    // budget = 100*4 div 5 = 80, epochCap = 2 -> caps {a:20, b:80, c:100}.
    // waterfill ascending (a, b, c):
    //   k=3 share=80 div 3=26 -> a takes cap 20, rem 60
    //   k=2 share=30          -> b takes share 30 (cap 80), rem 30
    //   k=1 share=30          -> c takes share 30 (cap 100), rem 0
    val docs = Seq(
      ("a", 5L), ("a", 5L), ("b", 40L), ("c", 50L)).toDF("source", "n_tok")
    val got = Sampling.unimaxTargets(docs, col("source"), col("n_tok"),
        budgetNum = 4, budgetDen = 5, epochCap = 2)
      .select("source", "n_tokens", "cap_tokens", "alloc_tokens", "epochs_mu")
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(got === List(
      ("a", 10L, 20L, 20L, 2000000L),   // cap-limited: full 2 epochs
      ("b", 40L, 80L, 30L, 750000L),    // share-limited: 0.75 epochs
      ("c", 50L, 100L, 30L, 600000L)))  // share-limited: 0.6 epochs
    // total allocated never exceeds the budget
    assert(got.map(_._4).sum <= 80L)
  }

  test("unimaxTargets: uniform sources split the budget evenly (no cap binds)") {
    val docs = Seq(("a", 100L), ("b", 100L), ("c", 100L)).toDF("source", "n_tok")
    val got = Sampling.unimaxTargets(docs, col("source"), col("n_tok"),
        budgetNum = 1, budgetDen = 2, epochCap = 4)
      .select("source", "alloc_tokens").as[(String, Long)].collect().toList
    assert(got === List(("a", 50L), ("b", 50L), ("c", 50L)))
  }

  test("unimaxSelect: full epochs plus a deterministic partial pass") {
    // n = {a:10 (2x5), b:40, c:50}, budget 80, cap 2 epochs (the
    // unimaxTargets fixture): allocs a=20, b=30, c=30 ->
    // a: 2 full epochs, remainder 0; b: 0 full, rem 30 (fills 0 docs —
    // its one 40-token doc does not fit); c: 0 full, rem 30 (same).
    val docs = Seq(
      (1L, "a", 5L), (2L, "a", 5L), (3L, "b", 40L), (4L, "c", 50L))
      .toDF("doc_id", "source", "n_tok")
    val got = Sampling.unimaxSelect(docs, col("doc_id"), col("source"),
        col("n_tok"), budgetNum = 4, budgetDen = 5, epochCap = 2)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got === List(
      ("a", 10L, 20L, 2L, 0L, 0L, 0L),
      ("b", 40L, 30L, 0L, 30L, 0L, 0L),
      ("c", 50L, 30L, 0L, 30L, 0L, 0L)))
    graft.CachePool.releaseAll()
    // a divisible remainder: one source, 3 docs of 10 tokens, budget 20
    // at cap 4 -> alloc 20, 0 full epochs (20 div 30), remainder 20
    // fills exactly the 2 best-Knuth-ranked docs
    val d2 = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 10L))
      .toDF("doc_id", "source", "n_tok")
    val got2 = Sampling.unimaxSelect(d2, col("doc_id"), col("source"),
        col("n_tok"), budgetNum = 2, budgetDen = 3, epochCap = 4)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(got2 === List(("a", 30L, 20L, 0L, 20L, 2L, 20L)))
    graft.CachePool.releaseAll()
  }

  test("temperatureTargets flattens: a 100x bigger source gets only 10x the quota") {
    val docs = docsFrom(Map("big" -> 400, "small" -> 4))
    val targets = Sampling.temperatureTargets(docs, col("source"), lit(110L))
      .select("source", "target").as[(String, Long)].collect().toMap
    // √400 : √4 = 10 : 1 → targets 100 and 10
    assert(targets === Map("big" -> 100L, "small" -> 10L))
  }

  test("temperatureTargets: targets always sum to T (largest remainder)") {
    val cases = Table("counts",
      Map("a" -> 7, "b" -> 13, "c" -> 29),
      Map("a" -> 1, "b" -> 1, "c" -> 1, "d" -> 997),
      Map("x" -> 250, "y" -> 333))
    forAll(cases) { counts =>
      val docs = docsFrom(counts)
      for (t <- Seq(1L, 17L, 100L)) {
        val sum = Sampling.temperatureTargets(docs, col("source"), lit(t))
          .agg(org.apache.spark.sql.functions.sum("target")).as[Long].head()
        assert(sum === t, s"counts=$counts T=$t")
      }
    }
  }

  test("temperatureMix selects min(target, n_docs) per source, deterministically") {
    val docs = docsFrom(Map("a" -> 3, "b" -> 50))
    // √3·2^20=1815...; allocation strongly favors b but a is tiny: with
    // T = 40 source a's target can exceed its 3 docs → keeps all 3.
    val summary = Sampling.temperatureMixSummary(
        docs, col("doc_id"), col("source"), lit(40L))
      .as[(String, Long, Long, Long)].collect().toList
    summary.foreach { case (_, n, target, sel) =>
      assert(sel === math.min(target, n))
    }
    val (sel1, _) = Sampling.temperatureMix(docs, col("doc_id"), col("source"), lit(40L))
    val (sel2, _) = Sampling.temperatureMix(docs, col("doc_id"), col("source"), lit(40L))
    assert(sel1.select("doc_id").as[Long].collect().sorted.toSeq ===
      sel2.select("doc_id").as[Long].collect().sorted.toSeq)
    graft.CachePool.releaseAll()
  }

  test("temperatureMix selection is a subset of the corpus keyed by hash rank") {
    val docs = docsFrom(Map("a" -> 20, "b" -> 20))
    val (sel, targets) = Sampling.temperatureMix(docs, col("doc_id"), col("source"), lit(10L))
    val selIds = sel.as[(Long, String)].collect().toSet
    val all = docs.as[(Long, String)].collect().toSet
    assert(selIds.subsetOf(all))
    val perSource = sel.groupBy("source").count().as[(String, Long)].collect().toMap
    val t = targets.select("source", "target").as[(String, Long)].collect().toMap
    assert(perSource === t.filter(_._2 > 0))
    graft.CachePool.releaseAll()
  }

  test("tokenBudgetMix: quality-ranked fill equals a hand-computed greedy prefix") {
    // one source, budget fills down the quality rank until the running
    // token total would exceed the target
    val docs = Seq(
      (1L, "s", 10L, 0.9),
      (2L, "s", 10L, 0.8),
      (3L, "s", 10L, 0.7),
      (4L, "s", 2L, 0.6),   // 3 won't fit (run=30 > 25) and neither will
      (5L, "s", 10L, 0.5)   // anything after it: inclusive-cumsum gate
    ).toDF("doc_id", "source", "n_tok", "q")
    val (sel, targets) = Sampling.tokenBudgetMix(
      docs, col("doc_id"), col("source"), col("n_tok"), lit(25L),
      rankBy = Seq((col("q"), false)))
    assert(targets.select("target_tokens").as[Long].head() === 25L)
    assert(sel.select("doc_id").as[Long].collect().toSet === Set(1L, 2L))
    graft.CachePool.releaseAll()
  }

  test("tokenBudgetMix: token targets sum to T; fill never exceeds a source's budget") {
    val docs = (1 to 60).map { i =>
      val src = if (i % 3 == 0) "big" else "small"
      (i.toLong, src, (i % 7 + 1).toLong, (i % 11).toDouble)
    }.toDF("doc_id", "source", "n_tok", "q")
    val summary = Sampling.tokenBudgetMixSummary(
        docs, col("doc_id"), col("source"), col("n_tok"), lit(50L),
        rankBy = Seq((col("q"), false)))
      .as[(String, Long, Long, Long, Long)].collect().toList
    assert(summary.map(_._3).sum === 50L)
    summary.foreach { case (src, _, target, _, selTok) =>
      assert(selTok <= target, s"$src overfilled: $selTok > $target")
    }
    // zero-token docs never selected, and the default hash rank is
    // deterministic across runs
    val withZero = docs.union(Seq((999L, "big", 0L, 99.0)).toDF(
      "doc_id", "source", "n_tok", "q"))
    val (s1, _) = Sampling.tokenBudgetMix(
      withZero, col("doc_id"), col("source"), col("n_tok"), lit(50L))
    val ids1 = s1.select("doc_id").as[Long].collect().sorted.toSeq
    assert(!ids1.contains(999L))
    val (s2, _) = Sampling.tokenBudgetMix(
      withZero, col("doc_id"), col("source"), col("n_tok"), lit(50L))
    assert(ids1 === s2.select("doc_id").as[Long].collect().sorted.toSeq)
    graft.CachePool.releaseAll()
  }

  test("TopicClusters gate holds on the planted-label embeddings") {
    val vecs = table("embeddings")
    val row = graft.similarity.TopicClusters.clusterGate(
      vecs, col("vec_id"), col("embedding"), k = 8).collect()(0)
    assert(row.getAs[Long]("n_vecs") === vecs.count())
    assert(row.getAs[Boolean]("complete_ok"))
    assert(row.getAs[Boolean]("used_ok"))
    assert(row.getAs[Boolean]("inertia_ok"))
    graft.CachePool.releaseAll()
  }

  test("TopicClusters.clusterGate handles k = 1 (the baseline-equals-index case)") {
    val vecs = table("embeddings").limit(50)
    val row = graft.similarity.TopicClusters.clusterGate(
      vecs, col("vec_id"), col("embedding"), k = 1).collect()(0)
    assert(row.getAs[Long]("n_vecs") === 50L)
    assert(row.getAs[Boolean]("complete_ok"))
    assert(row.getAs[Boolean]("used_ok"))
    graft.CachePool.releaseAll()
  }

  test("TopicClusters.assign puts scaled copies in the same cluster") {
    val vecs = table("embeddings")
    val index = graft.similarity.IvfKnn.fit(
      vecs.select(col("embedding")), nlist = 8, seed = 42L)
    val scaled = vecs.select(col("vec_id"),
      transform(col("embedding"), x => x * lit(0.25f)).as("embedding"))
    val a = graft.similarity.TopicClusters.assign(
      vecs, col("vec_id"), col("embedding"), index)
    val b = graft.similarity.TopicClusters.assign(
        scaled, col("vec_id"), col("embedding"), index)
      .withColumnRenamed("cluster", "cluster_b")
    assert(a.join(b, "vec_id").filter(col("cluster") =!= col("cluster_b")).count() === 0)
  }
}
