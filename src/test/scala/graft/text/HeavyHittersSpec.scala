package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("cmsTopTermsGate: exact counts, certificates hold, order is (n_occ desc, term)") {
    val docs = Seq(
      (1L, "alpha alpha alpha beta"),
      (2L, "alpha beta gamma"),
      (3L, "beta beta")
    ).toDF("doc_id", "text")
    val got = HeavyHitters.cmsTopTermsGate(docs, col("text"), k = 2)
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect().toList
    graft.CachePool.releaseAll()
    // alpha ×4, beta ×4 (tie → alpha first), gamma ×1; 9 insertions total
    assert(got === List(("alpha", 4L, 4L, 9L, true, true),
      ("beta", 4L, 4L, 9L, true, true)))
  }

  test("CMS probe matches the SQL agg's insertion hashing exactly on a tiny vocab") {
    // with ε = 1e-4 and 9 insertions the width (~27k counters) makes a
    // collision essentially impossible, so est == exact — this pins that
    // the driver-side byte probe hashes like the executor-side inserts
    // (a mismatch would read a random counter and fail ge/within wildly)
    val docs = Seq((1L, "x y z x")).toDF("doc_id", "text")
    val got = HeavyHitters.cmsTopTermsGate(docs, col("text"), k = 3)
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect().toList
    graft.CachePool.releaseAll()
    assert(got === List(("x", 2L, 2L, 4L, true, true), ("y", 1L, 1L, 4L, true, true),
      ("z", 1L, 1L, 4L, true, true)))
  }

  test("gate holds on the real documents table") {
    val got = HeavyHitters.cmsTopTermsGate(table("documents"), col("text"), k = 20)
      .as[(String, Long, Long, Long, Boolean, Boolean)].collect()
    graft.CachePool.releaseAll()
    assert(got.length === 20)
    assert(got.forall(r => r._3 === r._2),
      "the oracle restates cms_est = n_occ: a collision appeared — re-measure before trusting the conversion")
    assert(got.forall(_._5), "CMS underestimated a count — impossible by construction")
    assert(got.forall(_._6), "CMS estimate above the ε·N bound")
    // sorted by occurrence desc
    assert(got.map(_._2).toSeq === got.map(_._2).sortBy(-_).toSeq)
  }
}
