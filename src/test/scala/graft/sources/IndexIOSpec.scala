package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.BloomDedup
import graft.similarity.{IvfKnn, OpqKnn, PqKnn, TopicClusters}

/** Round-trip persistence for every index artifact: a loaded index must
  * behave identically to the fitted one (fit once, search forever).
  */
class IndexIOSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString

  test("IVF index round-trips and assigns identically") {
    val vecs = table("embeddings")
    val fitted = IvfKnn.fit(vecs.select(col("embedding")), nlist = 8, seed = 42L)
    val path = tmp("ivf")
    IndexIO.saveIvf(spark, fitted, path)
    val loaded = IndexIO.loadIvf(spark, path)
    assert(loaded.centroids.map(_.toSeq).toSeq === fitted.centroids.map(_.toSeq).toSeq)
    val a = TopicClusters.assign(vecs, col("vec_id"), col("embedding"), fitted)
    val b = TopicClusters.assign(vecs, col("vec_id"), col("embedding"), loaded)
      .withColumnRenamed("cluster", "cluster_b")
    assert(a.join(b, "vec_id").filter(col("cluster") =!= col("cluster_b")).count() === 0)
  }

  test("PQ codebooks round-trip bit-exactly") {
    val vecs = table("embeddings")
    val fitted = PqKnn.fit(vecs.select(col("embedding")), m = 8, ksub = 16, seed = 7L)
    val path = tmp("pq")
    IndexIO.savePq(spark, fitted, path)
    val loaded = IndexIO.loadPq(spark, path)
    assert(loaded.dim === fitted.dim)
    assert(loaded.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      fitted.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("OPQ rotation + codebooks round-trip bit-exactly") {
    val vecs = table("embeddings")
    val fitted = OpqKnn.fit(vecs.select(col("embedding")), m = 8, ksub = 16, seed = 7L)
    val path = tmp("opq")
    IndexIO.saveOpq(spark, fitted, path)
    val loaded = IndexIO.loadOpq(spark, path)
    assert(loaded.rotation.map(_.toSeq).toSeq === fitted.rotation.map(_.toSeq).toSeq)
    assert(loaded.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq ===
      fitted.pq.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("Bloom filter round-trips and probes identically") {
    val docs = table("documents")
    val bf = BloomDedup.buildFilter(docs, col("text"), expectedItems = 1000L)
    val path = tmp("bloom")
    IndexIO.saveBloom(spark, bf, path, 1000L, 0.03)
    val loaded = IndexIO.loadBloom(spark, path)
    assert(java.util.Arrays.equals(loaded, bf))
    val misses = docs.filter(
      !BloomDedup.mightContain(loaded, BloomDedup.normHash(col("text")))).count()
    assert(misses === 0L)
  }

  test("eval gram set round-trips sorted") {
    val docs = table("documents").limit(20)
    val grams = graft.text.Decontaminate.evalGramHashes(docs, col("doc_id"), col("text"))
    val path = tmp("grams")
    IndexIO.saveGrams(spark, grams, path)
    val loaded = IndexIO.loadGrams(spark, path)
    assert(loaded.toSeq === grams.toSeq.sorted)
  }

  test("BPE merge table round-trips in rank order and encodes identically") {
    import graft.functions.BpeExprs
    import graft.text.{TextAnalysis, Vocab}
    import spark.implicits._
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val table = Vocab.bpeMerges(docs, col("doc_id"), col("text"), 10, 10)
      .select("left", "right").as[(String, String)].collect().toSeq
    val path = tmp("bpe")
    IndexIO.saveBpe(spark, table, path)
    val loaded = IndexIO.loadBpe(spark, path)
    assert(loaded === table)
    val toks = TextAnalysis.tokens(col("text"))
    val pair = docs.select(
        BpeExprs.encodeCount(toks, table).as("a"),
        BpeExprs.encodeCount(toks, loaded).as("b"))
      .as[(Long, Long)].head()
    assert(pair._1 === pair._2)
  }

  test("classifier model round-trips sparsely and scores identically") {
    import graft.text.QualityClassifier
    import spark.implicits._
    val pos = (1L to 20L).map(i => (i, s"clean doc $i with plain tokens")).toDF("doc_id", "text")
    val neg = (101L to 120L).map(i => (i, s"clean doc $i with plain tokens zxq zxq junkmarker"))
      .toDF("doc_id", "text")
    val model = QualityClassifier.fit(pos, neg, col("doc_id"), col("text"),
      buckets = 256, iters = 20, lr = 2.0)
    val path = tmp("qc")
    IndexIO.saveClassifier(spark, model, path)
    val loaded = IndexIO.loadClassifier(spark, path)
    assert(loaded.buckets === model.buckets)
    assert(loaded.bias === model.bias)
    assert(loaded.w.toSeq === model.w.toSeq)
    val a = QualityClassifier.score(pos.union(neg), col("doc_id"), col("text"), model)
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    val b = QualityClassifier.score(pos.union(neg), col("doc_id"), col("text"), loaded)
      .select("doc_id", "margin").as[(Long, Double)].collect().toMap
    assert(a === b)
    graft.CachePool.releaseAll()
  }

  test("SQ8 code table round-trips byte-identically with its scale riding alongside") {
    import spark.implicits._
    val vecs = table("embeddings")
    val codes = vecs.select(col("vec_id"),
      graft.functions.VecOps.sq8F(col("embedding"), 6).as("code"))
    val path = tmp("sq8")
    // saveSq8 quantizes internally from the floats — the persisted scale
    // cannot disagree with the codes (ADVICE r15)
    IndexIO.saveSq8(spark, vecs.select("vec_id", "embedding"), scaleBits = 6, path)
    val (loaded, bits) = IndexIO.loadSq8(spark, path)
    assert(bits === 6, "the grid scale must travel with the table")
    val want = codes.as[(Long, Seq[Byte])].collect().toMap
    val got = loaded.as[(Long, Seq[Byte])].collect().toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, c) => assert(c === want(id), s"vec $id codes drifted") }
    // serving from the loaded table equals serving from the floats
    val q = vecs.filter(col("vec_id") < 5)
    val fromFloats = graft.similarity.SqKnn.topK(vecs, q, k = 3)
      .collect().map(_.toSeq)
    val fromDisk = graft.similarity.SqKnn.topKCodes(loaded, q, k = 3, scaleBits = bits)
      .collect().map(_.toSeq)
    assert(fromDisk.toSeq === fromFloats.toSeq)
  }

  test("IVF+SQ8 composite index round-trips: codebook, scale and postings all bound") {
    import spark.implicits._
    val vecs = table("embeddings")
    val codebook = graft.similarity.IvfKnn.IvfIndex(
      Array.tabulate(8)(j => Array.tabulate(64)(k => if (k == j) 1.0f else 0.0f)))
    val path = tmp("ivfsq8")
    IndexIO.saveIvfSq8(spark, vecs.select("vec_id", "embedding"), codebook,
      scaleBits = 6, path)
    val (postings, cb, bits) = IndexIO.loadIvfSq8(spark, path)
    assert(bits === 6)
    assert(cb.centroids.length === codebook.centroids.length)
    cb.centroids.zip(codebook.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq, "codebook drifted through the round trip")
    }
    // loaded postings equal a fresh in-memory assign+quantize, row for row
    val want = vecs.select(col("vec_id"),
        graft.similarity.IvfKnn.nearestCells(col("embedding"), codebook, 1)
          .getItem(0).cast("long").as("cell"),
        graft.functions.VecOps.sq8F(col("embedding"), 6).as("code"))
      .as[(Long, Long, Seq[Byte])].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val got = postings.as[(Long, Long, Seq[Byte])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (cell, code)) =>
      assert(cell === want(id)._1, s"vec $id cell drifted")
      assert(code === want(id)._2, s"vec $id code drifted")
    }
    // the posting table lands cell-partitioned so a probe reader can
    // prune to its probed cells
    val dirs = new java.io.File(s"$path/postings").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell=")).sorted
    assert(dirs.nonEmpty, "postings must be laid out cell=.../")
  }

  private def oneHot = graft.similarity.IvfKnn.IvfIndex(
    Array.tabulate(8)(j => Array.tabulate(64)(k => if (k == j) 1.0f else 0.0f)))

  private def graphState(path: String)
      : (Map[Long, (Long, Seq[Byte])], Set[(Long, Long, Long)]) = {
    import spark.implicits._
    val (nodes, edges, _, _, _) = IndexIO.loadGraph(spark, path)
    val n = nodes.as[(Long, Long, Seq[Byte])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val e = edges.select("src", "dst", "dist").as[(Long, Long, Long)].collect().toSet
    (n, e)
  }

  test("graph index round-trips: codebook, scale, degree, nodes and edges all bound") {
    val vecs = table("embeddings")
    val path = tmp("graph")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, path)
    val (nodes, edges, cb, bits, m) = IndexIO.loadGraph(spark, path)
    assert(bits === 6 && m === 4)
    cb.centroids.zip(oneHot.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq, "codebook drifted through the round trip")
    }
    // loaded nodes equal a fresh assign+quantize; loaded edges equal a
    // fresh coCellGraph — bit for bit
    val assigned = graft.CachePool.persist(vecs.select(col("vec_id"),
      graft.similarity.IvfKnn.nearestCells(col("embedding"), oneHot, 1)
        .getItem(0).cast("long").as("cell"),
      graft.functions.VecOps.sq8F(col("embedding"), 6).as("code")))
    import spark.implicits._
    val wantNodes = assigned.as[(Long, Long, Seq[Byte])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val wantEdges = graft.similarity.GraphKnn.coCellGraph(assigned, m = 4)
      .as[(Long, Long, Long)].collect().toSet
    val (gotNodes, gotEdges) = graphState(path)
    assert(gotNodes === wantNodes, "node table drifted through the round trip")
    assert(gotEdges === wantEdges, "edge set drifted through the round trip")
    graft.CachePool.releaseAll()
    // both tables land cell-partitioned so a serving reader prunes
    Seq("nodes", "edges").foreach { t =>
      val dirs = new java.io.File(s"$path/$t").listFiles()
        .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cell="))
      assert(dirs.nonEmpty, s"$t must be laid out cell=.../")
    }
  }

  test("appendGraph merges a late batch into exactly the full rebuild, touched cells only") {
    val vecs = table("embeddings")
    val base = vecs.filter(col("vec_id") % 4 =!= 0)
    val late = vecs.filter(col("vec_id") % 4 === 0)
    val merged = tmp("graph_append")
    IndexIO.saveGraph(spark, base.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, merged)
    IndexIO.appendGraph(spark, late.select("vec_id", "embedding"), merged)
    val rebuilt = tmp("graph_rebuild")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, rebuilt)
    val (mn, me) = graphState(merged)
    val (rn, re) = graphState(rebuilt)
    assert(mn === rn, "merged node table must equal the full rebuild's")
    assert(me.size === re.size &&
      (me -- re).isEmpty && (re -- me).isEmpty,
      s"merged edges must equal the rebuild's; extra=${(me -- re).take(3)} missing=${(re -- me).take(3)}")
  }

  test("appendGraph ignores ids already resident: re-append is an idempotent no-op") {
    val vecs = table("embeddings")
    val path = tmp("graph_reappend")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, path)
    val (n0, e0) = graphState(path)
    // re-append a slice that is fully resident: without the ADVICE r17
    // anti-join this duplicates its node rows and corrupts the refreshed
    // edges' membership
    IndexIO.appendGraph(spark,
      vecs.filter(col("vec_id") % 5 === 0).select("vec_id", "embedding"), path)
    val (n1, e1) = graphState(path)
    assert(n1 === n0, "re-appending resident ids must not change the node table")
    assert(e1 === e0, "re-appending resident ids must not change the edge set")
  }

  test("loadGraph refuses an artifact with an unfinished maintenance run") {
    val vecs = table("embeddings")
    val path = tmp("graph_torn")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, path)
    val marker = new java.io.File(s"$path/_MAINTENANCE_PENDING")
    java.nio.file.Files.writeString(marker.toPath, "append 0\n")
    val e = intercept[IllegalArgumentException](IndexIO.loadGraph(spark, path))
    assert(e.getMessage.contains("unfinished maintenance"), e.getMessage)
    // a completed maintenance run removes the marker and load works again
    marker.delete()
    IndexIO.appendGraph(spark,
      vecs.filter(col("vec_id") % 4 === 0).select("vec_id", "embedding"), path)
    assert(!marker.exists(), "successful maintenance must clear its marker")
    val (nodes, _, _, _, _) = IndexIO.loadGraph(spark, path)
    assert(nodes.count() > 0)
  }

  test("deleteFromGraph shrinks to exactly the survivor rebuild") {
    val vecs = table("embeddings")
    val shrunk = tmp("graph_delete")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, shrunk)
    IndexIO.deleteFromGraph(spark,
      vecs.filter(col("vec_id") % 10 === 0).select("vec_id"), shrunk)
    val rebuilt = tmp("graph_delete_rebuild")
    IndexIO.saveGraph(spark,
      vecs.filter(col("vec_id") % 10 =!= 0).select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, rebuilt)
    val (sn, se) = graphState(shrunk)
    val (rn, re) = graphState(rebuilt)
    assert(sn === rn, "post-delete node table must equal the survivor rebuild's")
    assert((se -- re).isEmpty && (re -- se).isEmpty,
      s"post-delete edges must equal the survivor rebuild's; " +
        s"stale=${(se -- re).take(3)} missing=${(re -- se).take(3)}")
  }

  test("cloneGraph snapshots byte-state; surgery on the clone leaves the source intact") {
    val vecs = table("embeddings")
    val src = tmp("graph_clone_src")
    val dst = tmp("graph_clone_dst")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, src)
    IndexIO.cloneGraph(src, dst)
    val (srcN0, srcE0) = graphState(src)
    val (cloneN, cloneE) = graphState(dst)
    assert(cloneN === srcN0 && cloneE === srcE0,
      "clone must equal the source byte-state")
    // destructive surgery on the clone: partition overwrites + vacuum
    IndexIO.deleteFromGraph(spark,
      vecs.filter(col("vec_id") % 3 === 0).select("vec_id"), dst)
    val (srcN1, srcE1) = graphState(src)
    assert(srcN1 === srcN0 && srcE1 === srcE0,
      "surgery on the clone must not reach the source")
    // a torn source refuses to clone
    val marker = new java.io.File(s"$src/_MAINTENANCE_PENDING")
    java.nio.file.Files.writeString(marker.toPath, "append 0\n")
    intercept[IllegalArgumentException](IndexIO.cloneGraph(src, tmp("graph_clone_t")))
    marker.delete(): Unit
  }

  test("tombstone + merge-on-read + compact: MoR view equals the compacted artifact") {
    import spark.implicits._
    val vecs = table("embeddings")
    val path = tmp("graph_mor")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, path)
    IndexIO.tombstoneGraph(spark,
      vecs.filter(col("vec_id") % 10 === 0).select("vec_id"), path)
    // the MoR view, captured BEFORE compaction mutates the dirs it reads
    val (mn, me, _, _, _) = IndexIO.loadGraphMor(spark, path)
    val morNodes = mn.select("vec_id", "cell").as[(Long, Long)].collect().toSet
    val morEdges = me.select("src", "dst", "dist").as[(Long, Long, Long)]
      .collect().toSet
    IndexIO.compactGraph(spark, path)
    assert(!new java.io.File(s"$path/tombstones").exists(),
      "compaction must clear the tombstone log")
    val (gotNodes, gotEdges) = graphState(path)
    assert(morNodes === gotNodes.map { case (v, (c, _)) => (v, c) }.toSet,
      "MoR node view must equal the compacted artifact's")
    assert(morEdges === gotEdges,
      "MoR edge view must equal the compacted artifact's")
    // and the compacted artifact equals the survivor rebuild
    val rebuilt = tmp("graph_mor_rebuild")
    IndexIO.saveGraph(spark,
      vecs.filter(col("vec_id") % 10 =!= 0).select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, rebuilt)
    val (rn, re) = graphState(rebuilt)
    assert(gotNodes === rn && gotEdges === re,
      "compacted artifact must equal the survivor rebuild")
  }

  test("deleteFromGraph erases a whole cell: stale node and edge dirs are reconciled") {
    import spark.implicits._
    val vecs = table("embeddings")
    val path = tmp("graph_delete_cell")
    IndexIO.saveGraph(spark, vecs.select("vec_id", "embedding"), oneHot,
      scaleBits = 6, m = 4, path)
    // delete EVERY member of one cell — the case dynamic overwrite cannot
    // clear (no survivor rows → no partition written)
    val (nodes0, _, _, _, _) = IndexIO.loadGraph(spark, path)
    val victim = nodes0.select("cell").as[Long].head()
    val victims = nodes0.filter(col("cell") === victim).select("vec_id")
    // capture the expectation BEFORE the dir mutates (nodes0 is lazy)
    val keepCount = nodes0.filter(col("cell") =!= victim).count()
    IndexIO.deleteFromGraph(spark, victims, path)
    Seq("nodes", "edges").foreach { t =>
      assert(!new java.io.File(s"$path/$t/cell=$victim").exists(),
        s"emptied cell must be vacuumed from $t")
    }
    val (nodes1, edges1, _, _, _) = IndexIO.loadGraph(spark, path)
    assert(nodes1.filter(col("cell") === victim).count() === 0)
    assert(edges1.filter(col("cell") === victim).count() === 0)
    // untouched cells keep every byte
    assert(nodes1.count() === keepCount)
  }
}
