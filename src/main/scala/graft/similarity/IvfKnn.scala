package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes only
  * its `nprobe` nearest cells and ranks exact cosine inside them.
  *
  * Scale design: training is a SAMPLE-based fit, hoisted out of the query
  * path — [[fit]] draws ~`samplePerCell` points per cell (centroids need
  * hundreds of points each, not the corpus), fits that bounded sample
  * locally ([[LocalKMeans]]), and returns an [[IvfIndex]] of plain float
  * arrays that ships to executors as literals. [[search]] is then assignment (a
  * per-row argmax over `nlist` codegen'd dot products, no shuffle) plus an
  * equi-join on the cell id — the same partitionable/skew-handleable shape
  * as the LSH variants, but with data-adaptive cells, which beats random
  * hyperplanes when the corpus is clustered. Fit once, search many: the
  * index is immutable data, reusable across every query batch.
  */
object IvfKnn {

  /** Unit-normalized coarse-quantizer centroids (plain data — broadcastable
    * as literals, serializable, reusable across query batches).
    */
  final case class IvfIndex(centroids: Array[Array[Float]]) {
    def nlist: Int = centroids.length
  }

  /** Train the coarse quantizer on a seeded sample of the corpus.
    * Deterministic for a fixed corpus, partitioning and seed. Normalizing
    * centroids makes the per-row argmax of x·ĉ an argmax of cos(x, c), so
    * scaled copies of a vector land in the same cell.
    *
    * `samplePerCell` bounds the training set at nlist × samplePerCell
    * expected points; that bounded sample is collected and fit with
    * [[LocalKMeans]] — one Spark job total, no per-iteration scheduling.
    */
  def fit(corpus: DataFrame, nlist: Int, seed: Long = 42L,
          samplePerCell: Int = 128, maxIter: Int = 10,
          corpusCount: Option[Long] = None): IvfIndex = {
    val n = corpusCount.getOrElse(corpus.count())
    val want = nlist.toLong * samplePerCell
    val sample =
      if (n <= want) corpus
      else corpus.sample(withReplacement = false, want.toDouble / n, seed)
    val points = sample.select(col("embedding").cast("array<float>"))
      .collect().map(_.getSeq[Float](0).toArray)
    IvfIndex(LocalKMeans.fit(points, nlist, seed, maxIter).map { a =>
      val norm = math.sqrt(a.map(x => x.toDouble * x).sum)
      a.map(x => if (norm == 0) 0.0f else (x / norm).toFloat)
    })
  }

  /** The `n` cell ids nearest (by cosine) to `emb`, best first. */
  def nearestCells(emb: Column, index: IvfIndex, n: Int): Column = {
    val scored = array(index.centroids.zipWithIndex.map { case (c, i) =>
      struct(VecOps.dotF(emb, VecOps.litVecF(c)).as("s"), lit(i).as("i"))
    }.toIndexedSeq: _*)
    transform(slice(reverse(array_sort(scored)), 1, n), s => s.getField("i"))
  }

  /** The APPEND path of index maintenance: assign a new batch to the
    * EXISTING centroids — (vec_id, cell), one codegen'd argmax per row, no
    * refit, no shuffle. This is what keeps the 100 TB index serviceable
    * between (re)trainings: the quantizer is immutable data, nightly crawl
    * batches append as pure assignment, and [[search]] over the merged
    * postings sees both epochs. Re-fit on drift is a policy decision
    * upstream (compare [[fit]] on a fresh sample against this index's
    * cell-population histogram), not an operational requirement.
    */
  def assignCells(index: IvfIndex, vecs: DataFrame): DataFrame =
    vecs.select(col("vec_id"),
      nearestCells(col("embedding"), index, 1).getItem(0).as("cell"))

  /** Search a pre-built index: probe `nprobe` cells per query, exact cosine
    * inside. Output (query_id, rnk, neighbor_id) like the other KNNs. The
    * query path is pure assignment + equi-join — no training jobs.
    */
  def search(index: IvfIndex, corpus: DataFrame, queries: DataFrame, k: Int,
             nprobe: Int = 4): DataFrame = {
    val c = corpus.select(
      nearestCells(col("embedding"), index, 1).getItem(0).as("cell"),
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      VecOps.normF(col("embedding")).as("c_norm"))
    val q = broadcast(queries.select(
      explode(nearestCells(col("embedding"), index, nprobe)).as("cell"),
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VecOps.normF(col("embedding")).as("q_norm")))
    // each corpus row has exactly ONE cell, so a (query, neighbor) pair can
    // arise from at most one probed cell — no post-join dedup needed.
    c.join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (VecOps.dotF(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm"))).as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")
  }

  /** fit + search in one call (the driver-graded query shape). */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
                 samplePerCell: Int = 128): DataFrame =
    search(fit(corpus, nlist, seed, samplePerCell), corpus, queries, k, nprobe)
}
