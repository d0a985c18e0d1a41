package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** OPQ: an orthogonal rotation learned from a sample, applied before the
  * product-quantizer subspace split (parametric OPQ — PCA directions with
  * eigenvalue allocation, Ge et al., CVPR 2013).
  *
  * Why: natural PQ cuts the vector into m contiguous slices. When
  * variance is unevenly spread or dimensions are correlated, some
  * subspaces carry nearly all the information (16 centroids cannot cover
  * them) while others quantize noise. A rotation that decorrelates
  * dimensions and BALANCES information across subspaces lowers
  * quantization error at identical code size — pure win for ADC recall.
  *
  * Spark shape: the rotation is fit driver-locally on the SAME bounded
  * sample the codebooks train on (zero extra jobs), ships as literals,
  * and applies as d codegen'd dot products per row — the same cost shape
  * as IVF cell assignment. Dot products are rotation-invariant
  * (q·x = Rq·Rx), so search semantics are unchanged; only the code
  * assignment improves.
  */
object OpqKnn {

  /** `rotation(j)` = output dimension j's direction (a row of R). */
  final case class OpqIndex(rotation: Array[Array[Float]], pq: PqKnn.PqIndex)

  /** R·x as a column: one codegen'd dot per output dimension (cast back to
    * float so downstream PQ slices stay on the float-array fast path).
    */
  def rotate(emb: Column, rotation: Array[Array[Float]]): Column =
    array(rotation.map(row =>
      VecOps.dotF(emb, VecOps.litVecF(row)).cast("float")).toIndexedSeq: _*)

  /** Fit rotation + codebooks from ONE bounded sample collect. */
  def fit(corpus: DataFrame, m: Int = 8, ksub: Int = 16, seed: Long = 42L,
          samplePerCentroid: Int = 64, maxIter: Int = 10,
          corpusCount: Option[Long] = None): OpqIndex = {
    val n = corpusCount.getOrElse(corpus.count())
    val want = ksub.toLong * samplePerCentroid
    val sample =
      if (n <= want) corpus
      else corpus.sample(withReplacement = false, want.toDouble / n, seed)
    val points = sample.select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    require(points.nonEmpty, "empty corpus")
    val dim = points(0).length
    require(dim % m == 0, s"dim $dim must be divisible by m=$m")
    val rotation = OpqRotation.fit(points, m)
    val rotated = points.map(p => OpqRotation.apply(rotation, p))
    OpqIndex(rotation, PqKnn.fitPoints(rotated, m, ksub, seed, maxIter))
  }

  /** (vec_id, codes) over the ROTATED corpus — otherwise plain PQ encode. */
  def encode(corpus: DataFrame, index: OpqIndex): DataFrame =
    PqKnn.encode(
      corpus.select(col("vec_id"), rotate(col("embedding"), index.rotation).as("embedding")),
      index.pq)

  /** ADC search with the query rotated into code space. */
  def searchEncoded(index: OpqIndex, encoded: DataFrame, queries: DataFrame,
                    k: Int): DataFrame =
    PqKnn.searchEncoded(index.pq, encoded,
      queries.select(col("vec_id"), rotate(col("embedding"), index.rotation).as("embedding")),
      k)

  /** fit + encode + search in one call (the driver-graded query shape). */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 m: Int = 8, ksub: Int = 16, seed: Long = 42L): DataFrame = {
    val index = fit(corpus, m, ksub, seed)
    val encoded = graft.CachePool.persist(encode(corpus, index))
    searchEncoded(index, encoded, queries, k)
  }
}

/** Driver-local rotation fit: covariance → Jacobi eigendecomposition →
  * eigenvalue allocation (principal directions dealt greedily to the
  * subspace with the least accumulated log-variance, so each subspace
  * gets a balanced share of the information). All O(d³)-ish on a d×d
  * matrix — microseconds at embedding dimensions, no dependencies.
  */
private[similarity] object OpqRotation {

  def apply(rotation: Array[Array[Float]], x: Array[Float]): Array[Float] =
    rotation.map { row =>
      var s = 0.0f
      var i = 0
      while (i < row.length) { s += row(i) * x(i); i += 1 }
      s
    }

  /** Rows of R, grouped by subspace (dsub consecutive rows each). */
  def fit(points: Array[Array[Float]], m: Int): Array[Array[Float]] = {
    val d = points(0).length
    val dsub = d / m
    val cov = covariance(points)
    val (eigVals, eigVecs) = jacobiEigen(cov) // eigVecs columns = directions
    // Greedy balanced allocation: directions by descending variance, each
    // to the (non-full) subspace with the smallest Σ log λ so far.
    val order = eigVals.indices.sortBy(i => -eigVals(i))
    val sizes = new Array[Int](m)
    val logSum = new Array[Double](m)
    val groups = Array.fill(m)(List.newBuilder[Int])
    order.foreach { idx =>
      var best = -1
      var bestLog = Double.MaxValue
      var g = 0
      while (g < m) {
        if (sizes(g) < dsub && logSum(g) < bestLog) { best = g; bestLog = logSum(g) }
        g += 1
      }
      groups(best) += idx
      sizes(best) += 1
      logSum(best) += math.log(math.max(eigVals(idx), 1e-12))
    }
    groups.flatMap(_.result()).map(idx =>
      Array.tabulate(d)(r => eigVecs(r)(idx).toFloat))
  }

  private def covariance(points: Array[Array[Float]]): Array[Array[Double]] = {
    val n = points.length
    val d = points(0).length
    val mean = new Array[Double](d)
    points.foreach { p => var i = 0; while (i < d) { mean(i) += p(i); i += 1 } }
    var i = 0
    while (i < d) { mean(i) /= n; i += 1 }
    val cov = Array.ofDim[Double](d, d)
    points.foreach { p =>
      var a = 0
      while (a < d) {
        val da = p(a) - mean(a)
        var b = a
        while (b < d) { cov(a)(b) += da * (p(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = a
      while (b < d) { cov(a)(b) /= n; cov(b)(a) = cov(a)(b); b += 1 }
      a += 1
    }
    cov
  }

  /** Cyclic Jacobi for symmetric matrices: (eigenvalues, eigenvector
    * matrix with eigenvectors as COLUMNS). Deterministic sweep order.
    */
  private def jacobiEigen(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var done = false
    while (sweep < 64 && !done) {
      var off = 0.0
      var p = 0
      while (p < n) {
        var q = p + 1
        while (q < n) { off += a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      if (off < 1e-20) done = true
      else {
        p = 0
        while (p < n) {
          var q = p + 1
          while (q < n) {
            val apq = a(p)(q)
            if (math.abs(apq) > 1e-15) {
              val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
              val t =
                if (theta == 0) 1.0
                else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
              val c = 1 / math.sqrt(t * t + 1)
              val s = t * c
              var i = 0
              while (i < n) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq
                a(i)(q) = s * aip + c * aiq
                i += 1
              }
              i = 0
              while (i < n) {
                val api = a(p)(i); val aqi = a(q)(i)
                a(p)(i) = c * api - s * aqi
                a(q)(i) = s * api + c * aqi
                i += 1
              }
              i = 0
              while (i < n) {
                val vip = v(i)(p); val viq = v(i)(q)
                v(i)(p) = c * vip - s * viq
                v(i)(q) = s * vip + c * viq
                i += 1
              }
            }
            q += 1
          }
          p += 1
        }
        sweep += 1
      }
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }
}
