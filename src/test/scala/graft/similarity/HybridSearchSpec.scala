package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  test("rrfFuse blends retriever rank and prior rank symmetrically") {
    // query 1: candidates a(rnk1), b(rnk2), c(rnk3); prior reverses the order
    val shortlist = Seq((1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L))
      .toDF("query_id", "rnk", "neighbor_id")
    val prior = Seq((10L, 0.1), (20L, 0.5), (30L, 0.9)).toDF("id", "prior_score")
    val got = HybridSearch.rrfFuse(shortlist, prior, k = 3)
      .select("fused_rank", "neighbor_id", "retriever_rank", "prior_rank")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // rrf: 10 -> 1/61+1/63; 20 -> 1/62+1/62; 30 -> 1/63+1/61
    // symmetric pairs (1,3) and (3,1) tie exactly -> neighbor_id breaks: 10 before 30
    // 1/61+1/63 > 2/62 (AM-HM), so the tied extremes outrank the middle
    assert(got.map(_._2) === Seq(10L, 30L, 20L))
    assert(got.map(_._1) === Seq(1L, 2L, 3L))
    // prior ranks computed within the shortlist: 30 has the best prior
    assert(got.find(_._2 == 30L).get._4 === 1L)
  }

  test("rrfFuse keeps k per query and orders queries independently") {
    val shortlist = Seq(
      (1L, 1, 10L), (1L, 2, 20L), (1L, 3, 30L),
      (2L, 1, 30L), (2L, 2, 10L)).toDF("query_id", "rnk", "neighbor_id")
    val prior = Seq((10L, 0.9), (20L, 0.5), (30L, 0.1)).toDF("id", "prior_score")
    val got = HybridSearch.rrfFuse(shortlist, prior, k = 2)
      .select("query_id", "fused_rank", "neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.count(_._1 == 1L) === 2)
    assert(got.count(_._1 == 2L) === 2)
    // query 1: candidate 10 leads both rankings -> fused_rank 1
    assert(got.filter(_._1 == 1L).head._3 === 10L)
  }

  test("candidates missing a prior row drop out (inner join contract)") {
    val shortlist = Seq((1L, 1, 10L), (1L, 2, 99L)).toDF("query_id", "rnk", "neighbor_id")
    val prior = Seq((10L, 0.5)).toDF("id", "prior_score")
    val got = HybridSearch.rrfFuse(shortlist, prior, k = 5)
      .select("neighbor_id").as[Long].collect().toSeq
    assert(got === Seq(10L))
  }
}
