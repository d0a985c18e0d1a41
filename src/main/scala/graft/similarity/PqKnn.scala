package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Product quantization (PQ) for embedding columns: compress each
  * d-dimensional float vector into `m` small codes (one per d/m-dim
  * subspace, `ksub` centroids each) and search with asymmetric distance
  * computation (ADC).
  *
  * Why it matters at 100 TB: a 64-dim float embedding is 256 bytes; its
  * PQ code at m=8, ksub=16 is 8 nibbles — a 32× shrink that turns an
  * un-broadcastable corpus into one that fits executor memory, and pair
  * scoring into `m` table lookups instead of a d-element dot product.
  *
  * Spark shapes: [[fit]] is m tiny sample-based KMeans fits (hoisted, like
  * [[IvfKnn.fit]]); [[encode]] is a per-row argmin over codebook literals —
  * pure projection, no shuffle; [[search]] broadcasts per-query lookup
  * tables (query × subspace × centroid partial dots, computed ONCE on the
  * query side) and scores each corpus row with an `aggregate` over its
  * m-element code array — all attributes by the time the lambda runs, so
  * nothing re-evaluates per element.
  */
object PqKnn {

  /** `codebooks(j)(c)` = centroid c of subspace j (dsub floats each). */
  final case class PqIndex(codebooks: Array[Array[Array[Float]]], dim: Int) {
    def m: Int = codebooks.length
    def ksub: Int = codebooks(0).length
    def dsub: Int = dim / m
  }

  private def subCol(emb: Column, j: Int, dsub: Int): Column =
    slice(emb, j * dsub + 1, dsub)

  /** Train per-subspace codebooks on a seeded sample (~`samplePerCentroid`
    * points per centroid). ONE bounded collect feeds all m local fits —
    * each sees only its dsub-dim slice (see [[LocalKMeans]]).
    */
  def fit(corpus: DataFrame, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
          samplePerCentroid: Int = 64, maxIter: Int = 10,
          corpusCount: Option[Long] = None): PqIndex = {
    val n = corpusCount.getOrElse(corpus.count())
    val want = ksub.toLong * samplePerCentroid
    val sample =
      if (n <= want) corpus
      else corpus.sample(withReplacement = false, want.toDouble / n, seed)
    val points = sample.select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    fitPoints(points, m, ksub, seed, maxIter)
  }

  /** Codebooks from an already-collected sample (shared with the OPQ
    * variant, which rotates the sample before the subspace split).
    */
  private[similarity] def fitPoints(points: Array[Array[Float]], m: Int, ksub: Int,
                                    seed: Long, maxIter: Int = 10): PqIndex = {
    require(points.nonEmpty, "empty corpus")
    val dim = points(0).length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val dsub = dim / m
    val books = (0 until m).map { j =>
      val sub = points.map(p => java.util.Arrays.copyOfRange(p, j * dsub, (j + 1) * dsub))
      LocalKMeans.fit(sub, ksub, seed + j, maxIter)
    }.toArray
    PqIndex(books, dim)
  }

  /** Per-subspace code: argmin-L2 centroid = argmax of (x·c − ‖c‖²/2).
    * Ties break toward the lower centroid id (deterministic).
    */
  private[similarity] def codeFor(emb: Column, book: Array[Array[Float]], j: Int, dsub: Int): Column = {
    val x = subCol(emb, j, dsub)
    val scored = array(book.zipWithIndex.map { case (c, i) =>
      val half = c.map(v => v * v).sum / 2.0f
      struct((VecOps.dotF(x, VecOps.litVecF(c)) - lit(half)).as("s"), lit(-i).as("ni"))
    }.toIndexedSeq: _*)
    (-array_max(scored).getField("ni")).as(s"c$j")
  }

  /** (vec_id, codes array<int> of length m): the compressed corpus. */
  def encode(vecs: DataFrame, index: PqIndex): DataFrame = {
    val codes = (0 until index.m).map(j =>
      codeFor(col("embedding"), index.codebooks(j), j, index.dsub))
    vecs.select(col("vec_id"), array(codes: _*).as("codes"))
  }

  /** Reconstruct (decode) embeddings from codes — the centroid per
    * subspace, concatenated. Lossy inverse of [[encode]].
    */
  def decode(encoded: DataFrame, index: PqIndex): DataFrame = {
    val bookLit = array(index.codebooks.map(book =>
      array(book.map(VecOps.litVecF).toIndexedSeq: _*)).toIndexedSeq: _*)
    encoded.select(col("vec_id"),
      flatten(zip_with(col("codes"), bookLit,
        (c, book) => element_at(book, c + 1))).as("embedding"))
  }

  /** The query-side m × ksub partial-dot lookup table over `embedding`:
    * lut(j)(c) = q_subspace_j · centroid_c. Shared by PQ and IVF-PQ search.
    */
  private[similarity] def lutFor(index: PqIndex): Column = {
    val dsub = index.dsub
    array((0 until index.m).map { j =>
      array(index.codebooks(j).map(c =>
        VecOps.dotF(subCol(col("embedding"), j, dsub), VecOps.litVecF(c))).toIndexedSeq: _*)
    }: _*)
  }

  /** ADC score: m table lookups summed — approximates q · reconstruct(x).
    * One native codegen'd loop ([[graft.functions.AdcScore]]) — the HOF
    * `aggregate(zip_with(...))` form allocates and interprets per row on
    * the hottest ANN inner loop; results are bit-identical (same
    * left-to-right double accumulation).
    */
  private[similarity] def adcScore(codes: Column, lut: Column): Column =
    VecOps.adcScore(codes, lut)

  /** (query_id, neighbor_id, score) → (query_id, rnk, neighbor_id), score
    * desc, deterministic neighbor tie-break. Shared ranking tail.
    */
  private[similarity] def rankTopK(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")

  /** Approximate top-k by ADC over PQ codes: each query precomputes its
    * m × ksub partial-dot lookup table ONCE (broadcast with the query);
    * each corpus row is scored with m array lookups over its code — the
    * corpus embeddings themselves are never touched after encoding.
    * Output (query_id, rnk, neighbor_id); ranking approximates the exact
    * DOT-product ranking (cosine when inputs are normalized).
    */
  def searchEncoded(index: PqIndex, encoded: DataFrame, queries: DataFrame,
                    k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), lutFor(index).as("lut")))
    rankTopK(
      encoded.join(q, col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          adcScore(col("codes"), col("lut")).as("score")),
      k)
  }

  /** fit + encode + search in one call (the driver-graded query shape).
    * The encoded corpus is persisted across the scoring join — at scale
    * you would materialize it once as a table and search it many times.
    */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 m: Int = 8, ksub: Int = 16, seed: Long = 42L): DataFrame = {
    val index = fit(corpus, m, ksub, seed)
    val encoded = graft.CachePool.persist(encode(corpus, index))
    searchEncoded(index, encoded, queries, k)
  }
}
