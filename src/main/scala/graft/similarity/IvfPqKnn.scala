package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** IVF-PQ: the composed production ANN index — an IVF coarse quantizer
  * restricts each query to `nprobe` cells, and within those cells scoring
  * runs over PQ codes with the query's broadcast lookup table instead of
  * raw vectors.
  *
  * This is the classical RESIDUAL form: PQ codebooks are trained on
  * `x − centroid(cell(x))` rather than raw vectors, so the 4-bit codes
  * spend their capacity on the (much smaller) within-cell displacement;
  * search scores `q·x ≈ q·centroid + Σ lut[code]`, with the per-cell
  * offset `q·centroid` computed once per (query, probed cell) on the
  * broadcast side.
  *
  * At 100 TB this composition is what actually ships: IVF bounds the
  * CANDIDATE COUNT (scan nprobe/nlist of the corpus), PQ bounds the
  * BYTES PER CANDIDATE (32× smaller codes, m lookups per score). The
  * corpus representation — (cell, codes) — is ~8 bytes per vector and
  * materializes once; searches touch nothing else.
  */
object IvfPqKnn {

  final case class Index(ivf: IvfKnn.IvfIndex, pq: PqKnn.PqIndex)

  private def centroidsLit(ivf: IvfKnn.IvfIndex): Column =
    array(ivf.centroids.map(VecOps.litVecF).toIndexedSeq: _*)

  /** (vec_id, cell, embedding := x − centroid(cell)) — the frame PQ sees. */
  private def residuals(corpus: DataFrame, ivf: IvfKnn.IvfIndex): DataFrame =
    corpus
      .select(col("vec_id"), col("embedding"),
        IvfKnn.nearestCells(col("embedding"), ivf, 1).getItem(0).as("cell"))
      .select(col("vec_id"), col("cell"),
        zip_with(col("embedding"), element_at(centroidsLit(ivf), col("cell") + 1),
          (x, c) => x - c).as("embedding"))

  /** Fit the coarse quantizer, then PQ codebooks on the cell residuals.
    * One corpus count shared by both fits; two bounded sample collects.
    */
  def fit(corpus: DataFrame, nlist: Int = 16, m: Int = 8, ksub: Int = 16,
          seed: Long = 42L): Index = {
    val n = Some(corpus.count())
    val ivf = IvfKnn.fit(corpus, nlist, seed, corpusCount = n)
    Index(ivf, PqKnn.fit(residuals(corpus, ivf), m, ksub, seed, corpusCount = n))
  }

  /** Quantize an already-computed residual frame: (vec_id, cell, codes).
    * Pure projection, no shuffle, no join.
    */
  private def encodeResiduals(res: DataFrame, pq: PqKnn.PqIndex): DataFrame = {
    val codes = (0 until pq.m).map(j =>
      PqKnn.codeFor(col("embedding"), pq.codebooks(j), j, pq.dsub))
    res.select(col("vec_id"), col("cell"), array(codes: _*).as("codes"))
  }

  /** The materialized search structure: (vec_id, cell, codes) — codes
    * quantize the residual.
    */
  def encode(corpus: DataFrame, index: Index): DataFrame =
    encodeResiduals(residuals(corpus, index.ivf), index.pq)

  /** Probe `nprobe` cells per query; score = q·centroid(cell) + ADC over
    * the residual codes. Output (query_id, rnk, neighbor_id).
    */
  def search(index: Index, encoded: DataFrame, queries: DataFrame, k: Int,
             nprobe: Int = 4): DataFrame = {
    val q = broadcast(queries
      .select(col("vec_id").as("query_id"), col("embedding"),
        explode(IvfKnn.nearestCells(col("embedding"), index.ivf, nprobe)).as("cell"))
      .select(col("query_id"), col("cell"),
        VecOps.dotF(col("embedding"), element_at(centroidsLit(index.ivf), col("cell") + 1))
          .cast("double").as("offset"),
        PqKnn.lutFor(index.pq).as("lut")))
    PqKnn.rankTopK(
      encoded.join(q, Seq("cell"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          (col("offset") + PqKnn.adcScore(col("codes"), col("lut"))).as("score")),
      k)
  }

  /** fit + encode + search (the driver-graded query shape). ONE residual
    * frame — cell assignment plus centroid subtraction over the whole
    * corpus, the expensive projection — is persisted and shared by PQ
    * training (its bounded sample collect) and encoding, and one corpus
    * count serves both fits.
    */
  def approxTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = 16, m: Int = 8, ksub: Int = 16,
                 nprobe: Int = 4, seed: Long = 42L): DataFrame = {
    val n = Some(corpus.count())
    val ivf = IvfKnn.fit(corpus, nlist, seed, corpusCount = n)
    val res = graft.CachePool.persist(residuals(corpus, ivf))
    val pq = PqKnn.fit(res, m, ksub, seed, corpusCount = n)
    val encoded = graft.CachePool.persist(encodeResiduals(res, pq))
    search(Index(ivf, pq), encoded, queries, k, nprobe)
  }
}
