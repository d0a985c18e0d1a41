package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VecOps

class GraphKnnSpec extends SparkSpec {
  import spark.implicits._

  private def oneHot = IvfKnn.IvfIndex(
    Array.tabulate(8)(j => Array.tabulate(64)(k => if (k == j) 1.0f else 0.0f)))

  private lazy val assigned = graft.CachePool.persist(
    table("embeddings").select(col("vec_id"),
      IvfKnn.nearestCells(col("embedding"), oneHot, 1)
        .getItem(0).cast("long").as("cell"),
      VecOps.sq8F(col("embedding"), 6).as("code")))

  test("coCellGraph: at most m edges per node, all co-cell, ranked by (dist, dst)") {
    val graph = GraphKnn.coCellGraph(assigned, m = 4)
    val perSrc = graph.groupBy("src").agg(count(lit(1)).as("deg"),
        max("dist").as("max_d")).as[(Long, Long, Long)].collect()
    assert(perSrc.nonEmpty)
    assert(perSrc.forall(_._2 <= 4), "degree must be capped at m")
    // every edge joins two members of the same cell
    val cellsOf = assigned.select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val crossCell = graph.select("src", "dst").as[(Long, Long)].collect()
      .filter { case (s, d) => cellsOf(s) != cellsOf(d) }
    assert(crossCell.isEmpty, s"cross-cell edges: ${crossCell.take(3).toSeq}")
    // the kept edges are the m NEAREST co-cell candidates: for one src,
    // no excluded candidate may beat the kept max under (dist, dst)
    val src0 = perSrc.filter(_._2 == 4).map(_._1).min
    val kept = graph.filter(col("src") === src0)
      .select("dst", "dist").as[(Long, Long)].collect().sortBy(r => (r._2, r._1))
    val all = assigned.filter(col("cell") === cellsOf(src0) && col("vec_id") =!= src0)
      .select(col("vec_id"))
      .join(assigned.filter(col("vec_id") === src0).select(col("code").as("sc")))
      .join(assigned.select(col("vec_id"), col("code")), "vec_id")
      .select(col("vec_id"), VecOps.sq8DistL2(col("sc"), col("code")).as("d"))
      .as[(Long, Long)].collect().sortBy(r => (r._2, r._1))
    assert(kept.toSeq === all.take(4).toSeq, "edges must be the exact top-m")
  }

  test("coCellGraph: tiled hot-cell build equals the raw self-join edge set") {
    // plant the hot-cell shape the bounded build exists for: with
    // hotCellThreshold=8 every cell (~60 rows at this sf) is hot and takes
    // the triangle-tiled path — a raw cell self-join would form the whole
    // n_c² pair block in one task. The kept edges must be IDENTICAL to the
    // raw join's top-m: tiling changes task shape, never the candidate set.
    val tiled = GraphKnn.coCellGraph(assigned, m = 4, hotCellThreshold = 8)
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3, r._2))
    val a = assigned.select(col("vec_id").as("src"), col("cell"),
      col("code").as("src_code"))
    val b = assigned.select(col("vec_id").as("dst"), col("cell"),
      col("code").as("dst_code"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("src").orderBy(col("dist"), col("dst"))
    val raw = a.join(b, Seq("cell")).filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"),
        VecOps.sq8DistL2(col("src_code"), col("dst_code")).as("dist"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 4).select("src", "dst", "dist")
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._3, r._2))
    assert(tiled.toSeq === raw.toSeq,
      "tiled build must reproduce the raw join's edge set exactly")
  }

  test("beamSearch: dense ranks, ascending exact distances, never the query itself") {
    val graph = graft.CachePool.persist(GraphKnn.coCellGraph(assigned, m = 4))
    val q = assigned.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("code").as("q_code"), col("cell"))
    val entries = q.join(
        assigned.groupBy("cell").agg(min("vec_id").as("node")), Seq("cell"))
      .select("query_id", "node")
    val before = graft.CachePool.registered
    val searched = GraphKnn.beamSearch(graph, assigned.select("vec_id", "code"),
        q.select("query_id", "q_code"), entries, k = 5, beam = 4, rounds = 3)
    // superseded per-round seen frames are released EAGERLY inside the
    // search (ADVICE r16): only the FINAL seen frame stays registered,
    // not one per round
    assert(graft.CachePool.registered === before + 1,
      "beamSearch must leave exactly its final seen frame registered")
    val got = searched.as[(Long, Int, Long, Long)].collect()
    val byQ = got.groupBy(_._1)
    assert(byQ.size === 20)
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === (1 to rows.length), s"ranks not dense for $qid")
      assert(sorted.map(_._4).toSeq === sorted.map(_._4).sorted.toSeq,
        s"distances must ascend with rank for $qid")
      assert(rows.forall(_._3 != qid), s"query $qid returned itself")
    }
    // distances are the exact integer SQ8 distances, recomputed pairwise
    val codes = assigned.select("vec_id", "code").as[(Long, Seq[Byte])]
      .collect().toMap
    def d(a: Long, b: Long): Long =
      codes(a).zip(codes(b)).map { case (x, y) =>
        val t = (x - y).toLong; t * t
      }.sum
    got.foreach { case (qid, _, nid, dist) =>
      assert(dist === d(qid, nid), s"distance drifted for ($qid, $nid)")
    }
    // the walk makes progress: each query's best found neighbor is at
    // least as close as its non-self entry distance (the beam keeps the
    // entry, so the final top-1 can never be worse)
    val entryD = entries.as[(Long, Long)].collect().toMap
    byQ.foreach { case (qid, rows) =>
      val e = entryD(qid)
      if (e != qid) {
        assert(rows.minBy(_._2)._4 <= d(qid, e),
          s"search returned worse than its own entry for $qid")
      }
    }
    // deterministic: a second run replays the identical shortlist
    val again = GraphKnn.beamSearch(graph, assigned.select("vec_id", "code"),
        q.select("query_id", "q_code"), entries, k = 5, beam = 4, rounds = 3)
      .as[(Long, Int, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq === got.sortBy(r => (r._1, r._2)).toSeq)
    graft.CachePool.releaseAll()
  }
}
