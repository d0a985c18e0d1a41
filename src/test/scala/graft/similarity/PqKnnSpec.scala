package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class PqKnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = table("embeddings")
  private lazy val index = PqKnn.fit(vecs)

  test("PQ codes are within range and the representation is 32x smaller") {
    val enc = PqKnn.encode(vecs, index)
    val bad = enc.filter(exists(col("codes"),
      c => c < 0 || c >= index.ksub)).count()
    assert(bad === 0L)
    assert(enc.select(size(col("codes"))).distinct().as[Int].collect().toSeq === Seq(index.m))
    // 8 codes of ksub=16 (4 bits each) vs 64 floats: 4 bytes vs 256.
    assert(index.m === 8 && index.ksub === 16 && index.dim === 64)
  }

  test("decode reconstructs with substantial cosine to the original") {
    val enc = PqKnn.encode(vecs, index)
    val joined = PqKnn.decode(enc, index).withColumnRenamed("embedding", "rec")
      .join(vecs, "vec_id")
    val avgCos = joined
      .select(avg(graft.functions.VecOps.cosineF(col("rec"), col("embedding")).cast("double")))
      .as[Double].head()
    // sf0.001 trains 16 centroids per subspace on only ~50 vectors; the
    // bound rises with corpus size (≈0.8 at sf0.01).
    assert(avgCos > 0.6, s"avg reconstruction cosine $avgCos")
  }

  test("encoding a codebook centroid is lossless (centroid maps to itself)") {
    // build one synthetic vector per subspace-0 centroid, padded with
    // subspace centroids elsewhere — its reconstruction must be exact.
    val cb = index.codebooks
    val synth = (0 until index.ksub).map { c =>
      (c.toLong, (0 until index.m).flatMap(j =>
        cb(j)(if (j == 0) c else 0).toSeq).toArray)
    }
    val df = synth.toDF("vec_id", "embedding")
    val rec = PqKnn.decode(PqKnn.encode(df, index), index)
      .withColumnRenamed("embedding", "rec").join(df, "vec_id")
    val exact = rec.filter(
      graft.functions.VecOps.cosineF(col("rec"), col("embedding")) > 0.999999f).count()
    assert(exact === index.ksub.toLong)
  }

  test("OPQ rotation beats natural PQ on a variance-concentrated corpus") {
    // Corpus with all its variance in the first natural subspace (dims 0-7
    // at sigma 8, the rest at 0.2): natural PQ gives those 8 dims one
    // 16-centroid codebook and wastes the other seven codebooks on noise,
    // while OPQ's eigenvalue allocation deals one dominant direction to
    // each subspace. Both effects are deterministic (seeded corpus, seeded
    // fits): quantization quality jumps (reconstruction cosine ~0.66 ->
    // ~0.99) and ADC recall@5 against exact brute force goes from 0/50 to
    // ~9/50 on a corpus whose tight score gaps make exact-top-5 recovery
    // genuinely hard.
    val rng = new scala.util.Random(5)
    val scales = Array.tabulate(64)(i => if (i < 8) 8.0f else 0.2f)
    val corpus = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(64)(d => rng.nextGaussian().toFloat * scales(d)))
    }.toDF("vec_id", "embedding").cache()
    val queries = corpus.filter(col("vec_id") < 10)
    val bf = Knn.bruteForceTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val pqHits = (bf & PqKnn.approxTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet).size
    val opqIdx = OpqKnn.fit(corpus)
    val opqHits = (bf & OpqKnn.approxTopK(corpus, queries, 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet).size
    graft.CachePool.releaseAll()
    assert(opqHits >= pqHits + 5, s"OPQ recall $opqHits must beat PQ recall $pqHits")
    assert(opqHits >= 7, s"OPQ recall@5 hits $opqHits")

    // the learned rotation must be orthogonal (dot products preserved)
    val r = opqIdx.rotation
    val maxDev = (for (i <- r.indices; j <- r.indices) yield {
      val s = (0 until r.length).map(t => r(i)(t).toDouble * r(j)(t)).sum
      math.abs(s - (if (i == j) 1.0 else 0.0))
    }).max
    assert(maxDev < 1e-5, s"rotation not orthogonal: deviation $maxDev")

    // reconstruction (the objective OPQ minimizes) improves decisively
    import graft.functions.VecOps
    val pqIdx = PqKnn.fit(corpus)
    val recPq = PqKnn.decode(PqKnn.encode(corpus, pqIdx), pqIdx)
      .withColumnRenamed("embedding", "rec").join(corpus, "vec_id")
      .select(avg(VecOps.cosineF(col("rec"), col("embedding")).cast("double")))
      .as[Double].head()
    val rotDf = corpus.select(col("vec_id"),
      OpqKnn.rotate(col("embedding"), r).as("embedding"))
    val recOpq = PqKnn.decode(PqKnn.encode(rotDf, opqIdx.pq), opqIdx.pq)
      .withColumnRenamed("embedding", "rec").join(rotDf, "vec_id")
      .select(avg(VecOps.cosineF(col("rec"), col("embedding")).cast("double")))
      .as[Double].head()
    corpus.unpersist()
    assert(recOpq > 0.95 && recPq < 0.85,
      f"reconstruction opq=$recOpq%.3f should decisively beat pq=$recPq%.3f")
  }

  test("OPQ on the isotropic corpus still surfaces planted near-copies") {
    // On already-isotropic data the rotation is information-neutral; the
    // planted-recovery property of the ADC path must survive it.
    val queries = vecs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f) + lit(0.01f)).as("embedding"))
    val got = OpqKnn.approxTopK(vecs, queries, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.size === 20)
    got.foreach { case (qid, nid) =>
      assert(nid === qid - 1000000L, s"OPQ top-1 of perturbed $qid should be its original")
    }
  }

  test("IVF-PQ search surfaces a planted near-copy's original through both quantizers") {
    // the perturbed copy must land in the same coarse cell as its original
    // (cosine ≈ 0.99 ⇒ same argmax centroid with near-certainty) AND
    // out-score the in-cell background through 4-bit ADC.
    val queries = vecs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f) + lit(0.01f)).as("embedding"))
    val idx = IvfPqKnn.fit(vecs, nlist = 8)
    val got = IvfPqKnn.search(idx, IvfPqKnn.encode(vecs, idx), queries, k = 1, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(got.size === 20)
    val hits = got.count { case (qid, nid) => nid == qid - 1000000L }
    // nprobe=2 of 8 cells: a perturbed copy whose original sits at a cell
    // boundary can probe past it — require near-total, not perfect, recall.
    assert(hits >= 18, s"IVF-PQ found $hits/20 planted originals")
  }

  test("native ADC score is bit-identical to the aggregate/zip_with HOF form") {
    val enc = PqKnn.encode(vecs, index)
    val q = vecs.limit(5).select(col("vec_id").as("query_id"),
      PqKnn.lutFor(index).as("lut"))
    val pairs = enc.crossJoin(q)
    val hof = aggregate(
      zip_with(col("codes"), col("lut"), (c, t) => element_at(t, c + 1)),
      lit(0.0), (acc, x) => acc + x)
    val mismatches = pairs.select(
        graft.functions.VecOps.adcScore(col("codes"), col("lut")).as("native"),
        hof.as("href"))
      .filter(col("native") =!= col("href")) // exact double equality
      .count()
    assert(mismatches === 0L)
  }

  test("ADC search ranks a planted near-copy's original first") {
    // The synthetic embeddings are near-orthogonal gaussians (same-label
    // cosine ≈ 0), so exact-top-5 agreement among ~0.2-cosine background
    // neighbors is noise-bound BY CONSTRUCTION — the meaningful property
    // is signal recovery: a perturbed copy (cosine ≈ 0.99 with its
    // original) must surface its original through 4-bit quantization.
    val queries = vecs.filter(col("vec_id") < 20)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.9f) + lit(0.01f)).as("embedding"))
    val adc = PqKnn.searchEncoded(index, PqKnn.encode(vecs, index), queries, k = 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(adc.size === 20)
    adc.foreach { case (qid, nid) =>
      assert(nid === qid - 1000000L, s"ADC top-1 of perturbed $qid should be its original")
    }
  }
}
