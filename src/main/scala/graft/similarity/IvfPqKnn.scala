package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** IVF-PQ: the composed production ANN index — an IVF coarse quantizer
  * restricts each query to `nprobe` cells, and within those cells scoring
  * runs over PQ codes with the query's broadcast lookup table instead of
  * raw vectors.
  *
  * At 100 TB this composition is what actually ships: IVF bounds the
  * CANDIDATE COUNT (scan nprobe/nlist of the corpus), PQ bounds the
  * BYTES PER CANDIDATE (32× smaller codes, m lookups per score). The
  * corpus representation — (cell, codes) — is 8-ish bytes per vector and
  * materializes once; searches touch nothing else. (This is the
  * plain-vector-PQ variant; residual encoding is the classical refinement
  * and slots into `PqKnn.fit` on `x − centroid(x)` unchanged.)
  */
object IvfPqKnn {

  final case class Index(ivf: IvfKnn.IvfIndex, pq: PqKnn.PqIndex)

  /** Fit both quantizers on bounded seeded samples (2 Spark jobs total). */
  def fit(corpus: DataFrame, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
          seed: Long = 42L): Index =
    Index(IvfKnn.fit(corpus, nlist, seed), PqKnn.fit(corpus, m, ksub, seed))

  /** The materialized search structure: (cell, vec_id, codes). */
  def encode(corpus: DataFrame, index: Index): DataFrame =
    PqKnn.encode(corpus, index.pq)
      .join(corpus.select(col("vec_id"),
        IvfKnn.nearestCells(col("embedding"), index.ivf, 1).getItem(0).as("cell")), "vec_id")

  /** Probe `nprobe` cells per query, ADC-score the PQ codes inside them.
    * Output (query_id, rnk, neighbor_id) like the other KNNs.
    */
  def search(index: Index, encoded: DataFrame, queries: DataFrame, k: Int,
             nprobe: Int = 4): DataFrame = {
    val dsub = index.pq.dsub
    val lut = array((0 until index.pq.m).map { j =>
      array(index.pq.codebooks(j).map(c =>
        VecOps.dotF(slice(col("embedding"), j * dsub + 1, dsub),
          array(c.map(lit).toIndexedSeq: _*))).toIndexedSeq: _*)
    }: _*)
    val q = broadcast(queries.select(
      explode(IvfKnn.nearestCells(col("embedding"), index.ivf, nprobe)).as("cell"),
      col("vec_id").as("query_id"), lut.as("lut")))
    encoded.join(q, Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        aggregate(
          zip_with(col("codes"), col("lut"), (c, t) => element_at(t, c + 1)),
          lit(0.0), (acc, x) => acc + x).as("score"))
      .groupBy("query_id", "neighbor_id").agg(max("score").as("score"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("score").desc, col("neighbor_id"))))
      .filter(col("rnk") <= k)
      .select("query_id", "rnk", "neighbor_id")
      .orderBy("query_id", "rnk")
  }

  /** fit + encode + search (the driver-graded query shape). */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                 nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val index = fit(corpus, nlist, m, ksub, seed)
    val encoded = graft.CachePool.persist(encode(corpus, index))
    search(index, encoded, queries, k, nprobe)
  }
}
