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
