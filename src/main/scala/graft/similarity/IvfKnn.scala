package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** IVF (inverted-file) approximate nearest neighbor: a KMeans coarse
  * quantizer partitions the corpus into `nlist` cells; a query probes only
  * its `nprobe` nearest cells and ranks exact cosine inside them.
  *
  * Scale design: training runs on a seeded SAMPLE (centroids need ~100
  * points per cell, not the corpus); assignment is a per-row argmax over
  * `nlist` codegen'd dot products (no shuffle); search is an equi-join on
  * the cell id — the same partitionable/skew-handleable shape as the LSH
  * variants, but with data-adaptive cells, which beats random hyperplanes
  * when the corpus is clustered.
  */
object IvfKnn {

  /** Unit-normalized centroids from a seeded KMeans fit over a sample.
    * Deterministic for a fixed corpus, partitioning and seed. Normalizing
    * centroids makes the per-row argmax of x·ĉ an argmax of cos(x, c),
    * so scaled copies of a vector land in the same cell.
    */
  def trainCentroids(corpus: DataFrame, nlist: Int, seed: Long = 42L,
                     sampleFraction: Double = 1.0): Array[Array[Float]] = {
    val sample =
      if (sampleFraction >= 1.0) corpus
      else corpus.sample(withReplacement = false, sampleFraction, seed)
    val feats = sample.select(
      array_to_vector(col("embedding").cast("array<double>")).as("features"))
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10).setFeaturesCol("features")
      .fit(feats)
    model.clusterCenters.map { c =>
      val a = c.toArray
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(x => if (n == 0) 0.0f else (x / n).toFloat)
    }
  }

  private def litVec(c: Array[Float]): Column = array(c.map(lit).toIndexedSeq: _*)

  /** The `n` cell ids nearest (by cosine) to `emb`, best first. */
  def nearestCells(emb: Column, centroids: Array[Array[Float]], n: Int): Column = {
    val scored = array(centroids.zipWithIndex.map { case (c, i) =>
      struct(VecOps.dotF(emb, litVec(c)).as("s"), lit(i).as("i"))
    }.toIndexedSeq: _*)
    transform(slice(reverse(array_sort(scored)), 1, n), s => s.getField("i"))
  }

  /** Approximate top-k: probe `nprobe` cells per query, exact cosine
    * inside. Output (query_id, rnk, neighbor_id) like the other KNNs.
    */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = 16, nprobe: Int = 4, seed: Long = 42L,
                 trainFraction: Double = 1.0): DataFrame = {
    // at scale pass trainFraction ≪ 1: centroids need ~100 points per
    // cell, not the corpus.
    val centroids = trainCentroids(corpus, nlist, seed, trainFraction)
    val c = corpus.select(
      nearestCells(col("embedding"), centroids, 1).getItem(0).as("cell"),
      col("vec_id").as("neighbor_id"), col("embedding").as("c_emb"),
      VecOps.normF(col("embedding")).as("c_norm"))
    val q = broadcast(queries.select(
      explode(nearestCells(col("embedding"), centroids, nprobe)).as("cell"),
      col("vec_id").as("query_id"), col("embedding").as("q_emb"),
      VecOps.normF(col("embedding")).as("q_norm")))
    c.join(q, Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        (VecOps.dotF(col("q_emb"), col("c_emb")) / (col("q_norm") * col("c_norm"))).as("sim"))
      .groupBy("query_id", "neighbor_id").agg(max("sim").as("sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")
  }
}
