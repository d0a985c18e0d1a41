package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._


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

  /** Fit both quantizers on bounded seeded samples; the corpus count is
    * computed once and shared (one count job + one sample collect per
    * quantizer).
    */
  def fit(corpus: DataFrame, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
          seed: Long = 42L): Index = {
    val n = Some(corpus.count())
    Index(IvfKnn.fit(corpus, nlist, seed, corpusCount = n),
      PqKnn.fit(corpus, m, ksub, seed, corpusCount = n))
  }

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
    val q = broadcast(queries.select(
      explode(IvfKnn.nearestCells(col("embedding"), index.ivf, nprobe)).as("cell"),
      col("vec_id").as("query_id"), PqKnn.lutFor(index.pq).as("lut")))
    PqKnn.rankTopK(
      encoded.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          PqKnn.adcScore(col("codes"), col("lut")).as("score"))
        // a corpus row can match a query through several probed cells —
        // collapse before ranking.
        .groupBy("query_id", "neighbor_id").agg(max("score").as("score")),
      k)
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
