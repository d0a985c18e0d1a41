package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupData

class SemDeDupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = table("embeddings")

  test("survivors: one survivor per duplicate group, distant vectors untouched") {
    // single cluster (k = 1): a and its scaled copy are a dup group,
    // the orthogonal vector is not a duplicate of anything
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (5L, Array(0.5f, 0.0f, 0.0f, 0.0f)),  // same direction as id 1
      (9L, Array(0.0f, 1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val surv = SemDeDup.survivors(df, col("vec_id"), col("embedding"),
        k = 1, threshold = 0.9)
      .as[Long].collect().toList
    graft.CachePool.releaseAll()
    // equal direction ⇒ equal centroid cosine ⇒ vec_id tie-break keeps 1
    assert(surv === List(1L, 9L))
  }

  test("survivors keeps the least prototypical member of a group") {
    // k = 1: centroid ≈ the dominant shared direction. The dup pair's
    // members have cosine > 0.9 to each other but different angles to
    // the centroid; the policy keeps the one farther from the centroid.
    val df = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      // cosine to e1 ≈ 0.928 > 0.9, but farther from the e1-dominated
      // centroid than the pure-e1 rows
      (4L, Array(0.9f, 0.36f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val surv = SemDeDup.survivors(df, col("vec_id"), col("embedding"),
        k = 1, threshold = 0.9)
      .as[Long].collect().toList
    graft.CachePool.releaseAll()
    // all four are one dup group (pairwise cosine > 0.9); id 4 has the
    // lowest centroid cosine, so it alone survives
    assert(surv === List(4L))
  }

  test("semDedupGate: planted scaled copies all resolve to their originals") {
    val row = SemDeDup.semDedupGate(
        DedupData.withPlantedVecDups(vecs),
        col("vec_id"), col("embedding"), k = 8, threshold = 0.9,
        plantedOffset = DedupData.ExactIdOffset)
      .collect()(0)
    graft.CachePool.releaseAll()
    val nBase = vecs.count()
    val nPlanted = vecs.filter(col("vec_id") % 5 === 0).count()
    assert(row.getAs[Long]("n_vecs") === nBase + nPlanted)
    assert(row.getAs[Long]("n_planted") === nPlanted)
    assert(row.getAs[Boolean]("planted_resolved_ok"))
    assert(row.getAs[Boolean]("originals_survive_ok"))
    assert(row.getAs[Boolean]("no_dup_survivors_ok"))
  }

  test("survivors equals the gate's accounting: n_survivors = n_vecs − removed") {
    val planted = DedupData.withPlantedVecDups(vecs)
    val surv = SemDeDup.survivors(planted, col("vec_id"), col("embedding"),
      k = 8, threshold = 0.9)
    val n = surv.count()
    graft.CachePool.releaseAll()
    val nBase = vecs.count()
    val nPlanted = vecs.filter(col("vec_id") % 5 === 0).count()
    // every planted pair loses exactly one member; random 64-dim
    // gaussians don't reach cosine 0.9, so nothing else is removed
    assert(n === nBase)
    assert(n === nBase + nPlanted - nPlanted)
  }
}
