package graft.similarity

/** Driver-local Lloyd's KMeans over a BOUNDED training sample.
  *
  * Index training (IVF coarse quantizers, PQ codebooks) needs only
  * O(k × samplePerCentroid) points — a few hundred KB that the caller has
  * already sampled down from the corpus. Fitting that locally costs
  * milliseconds and zero Spark jobs, where a distributed KMeans pays
  * multi-job scheduling overhead per iteration to scan a frame that fits
  * in L2 cache. (The no-collect rule is about corpus-sized data; a
  * bounded sample for hoisted index training is the standard ANN-build
  * shape.) Deterministic: seeded k-means++ initialization, fixed
  * iteration order.
  */
private[similarity] object LocalKMeans {

  private def distSq(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** k centroids from `points` (if fewer points than k, points recycle). */
  def fit(points: Array[Array[Float]], k: Int, seed: Long, maxIter: Int = 10): Array[Array[Float]] = {
    require(points.nonEmpty, "cannot fit on an empty sample")
    val n = points.length
    if (n <= k) return Array.tabulate(k)(i => points(i % n).clone())
    val rng = new java.util.Random(seed)
    val dim = points(0).length

    // k-means++ seeding: D²-weighted draws.
    val centroids = new Array[Array[Float]](k)
    centroids(0) = points(rng.nextInt(n)).clone()
    val minD = Array.fill(n)(Double.MaxValue)
    var c = 1
    while (c < k) {
      var total = 0.0
      var i = 0
      while (i < n) {
        val d = distSq(points(i), centroids(c - 1))
        if (d < minD(i)) minD(i) = d
        total += minD(i)
        i += 1
      }
      var r = rng.nextDouble() * total
      var pick = 0
      i = 0
      while (i < n && r > 0) { r -= minD(i); if (r > 0) i += 1 }
      pick = math.min(i, n - 1)
      centroids(c) = points(pick).clone()
      c += 1
    }

    // Lloyd iterations; an emptied cluster keeps its previous centroid.
    val assign = new Array[Int](n)
    var iter = 0
    var moved = true
    while (iter < maxIter && moved) {
      moved = false
      var i = 0
      while (i < n) {
        var best = 0
        var bestD = Double.MaxValue
        var j = 0
        while (j < k) {
          val d = distSq(points(i), centroids(j))
          if (d < bestD) { bestD = d; best = j }
          j += 1
        }
        if (assign(i) != best) { assign(i) = best; moved = true }
        i += 1
      }
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      i = 0
      while (i < n) {
        val s = sums(assign(i))
        val p = points(i)
        var d = 0
        while (d < dim) { s(d) += p(d); d += 1 }
        counts(assign(i)) += 1
        i += 1
      }
      var j = 0
      while (j < k) {
        if (counts(j) > 0) {
          val nc = new Array[Float](dim)
          var d = 0
          while (d < dim) { nc(d) = (sums(j)(d) / counts(j)).toFloat; d += 1 }
          centroids(j) = nc
        }
        j += 1
      }
      iter += 1
    }
    centroids
  }
}
