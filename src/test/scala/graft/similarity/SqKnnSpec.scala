package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VecOps

class SqKnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = table("embeddings")

  test("sq8F codes replay the exact ⌊x·2⁶⌋ clamp from the raw floats") {
    val got = vecs.select(col("vec_id"), col("embedding"),
        VecOps.sq8F(col("embedding"), 6).as("code"))
      .as[(Long, Seq[Float], Seq[Byte])].collect()
    assert(got.nonEmpty)
    got.foreach { case (id, emb, code) =>
      assert(code.length === emb.length)
      emb.zip(code).foreach { case (x, c) =>
        val q = math.max(-128L, math.min(127L, math.floor(x.toDouble * 64.0).toLong))
        assert(c.toLong === q, s"vec $id: code for $x should be $q, got $c")
      }
    }
  }

  test("Sq8DistL2 equals the integer replay over the quantized codes") {
    val rows = vecs.filter(col("vec_id") < 30)
      .select(col("vec_id"), VecOps.sq8F(col("embedding"), 6).as("code"))
    val a = rows.select(col("vec_id").as("ia"), col("code").as("ca"))
    val b = rows.select(col("vec_id").as("ib"), col("code").as("cb"))
    val got = a.join(b, col("ia") < col("ib"))
      .select(col("ia"), col("ib"), col("ca"), col("cb"),
        VecOps.sq8DistL2(col("ca"), col("cb")).as("dist"))
      .as[(Long, Long, Seq[Byte], Seq[Byte], Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (ia, ib, ca, cb, d) =>
      val want = ca.zip(cb).map { case (x, y) =>
        val df = (x - y).toLong; df * df
      }.sum
      assert(d === want, s"dist($ia,$ib)")
    }
  }

  test("topK ranks an exact planted copy first at distance 0") {
    val off = 1000000L
    val copies = vecs.filter(col("vec_id") < 10)
      .select((col("vec_id") + off).as("vec_id"), col("embedding"), col("label"))
    val corpus = vecs.unionByName(copies)
    val top1 = SqKnn.topK(corpus, copies, k = 1)
      .select("query_id", "neighbor_id", "dist").as[(Long, Long, Long)].collect()
    assert(top1.length === 10)
    top1.foreach { case (qid, nid, dist) =>
      assert(nid === qid - off, s"top-1 of copy $qid should be its original")
      assert(dist === 0L, s"identical floats quantize identically — dist 0")
    }
  }

  test("q_ivf_sq8: every shortlist entry comes from a probed cell; ranks dense, dists ascend") {
    val codebook = IvfKnn.IvfIndex(
      Array.tabulate(8)(j => Array.tabulate(64)(k => if (k == j) 1.0f else 0.0f)))
    val probes = vecs.filter(col("vec_id") < 20)
      .select(col("vec_id"),
        IvfKnn.nearestCells(col("embedding"), codebook, 2).as("cells"))
      .as[(Long, Seq[Int])].collect()
      .map { case (id, cs) => id -> cs.map(_.toLong).toSet }.toMap
    val got = graft.SparkEntry.queries("q_ivf_sq8")(spark, Sf)
      .select("query_id", "rnk", "neighbor_id", "cell", "dist")
      .as[(Long, Int, Long, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.map(_._1).distinct.size === 20)
    got.foreach { case (q, _, n, cell, _) =>
      assert(probes(q).contains(cell), s"query $q: neighbor $n from unprobed cell $cell")
      assert(n !== q)
    }
    got.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === (1 to rows.size), s"query $q ranks")
      val dists = rows.sortBy(_._2).map(_._5)
      assert(dists === dists.sorted, s"query $q distances ascend")
    }
  }

  test("topK emits dense ranks 1..k per query with integer-deterministic order") {
    val out = SqKnn.topK(vecs, vecs.filter(col("vec_id") < 5), k = 5)
      .select("query_id", "rnk", "dist").as[(Long, Int, Long)].collect()
      .groupBy(_._1)
    assert(out.size === 5)
    out.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === Seq(1, 2, 3, 4, 5), s"query $q ranks")
      val dists = rows.sortBy(_._2).map(_._3)
      assert(dists === dists.sorted, s"query $q distances ascend with rank")
    }
  }
}
