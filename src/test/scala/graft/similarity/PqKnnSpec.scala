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
