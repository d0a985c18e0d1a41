package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Reproducible sampling and corpus mixing.
  *
  * Everything keys off `xxhash64(id, salt)` rather than an RNG: the same
  * row makes the same keep/drop decision on any cluster, any partitioning,
  * any retry — which is what training-data reproducibility requires
  * (`sample()`'s per-partition RNG changes with the split layout).
  */
object Sampling {

  private val Scale = 1000000L

  /** Each function mixes its own tag into the hash: hashSample → split →
    * stratified compose independently. With ONE shared hash, splitting a
    * hash-sampled dataset would silently put 100% of rows in the first
    * bucket (the sample kept exactly the rows with small hash values).
    */
  private def bucketHash(key: Column, tag: String, salt: Long): Column =
    pmod(xxhash64(key, lit(tag), lit(salt)), lit(Scale))

  /** Keep ~`rate` of rows, decided by the row's own key. */
  def hashSample(df: DataFrame, key: Column, rate: Double, salt: Long = 0L): DataFrame = {
    require(rate >= 0.0 && rate <= 1.0)
    df.filter(bucketHash(key, "sample", salt) < lit((rate * Scale).toLong))
  }

  /** Per-stratum rates (e.g. domain → keep fraction); strata absent from
    * `rates` are dropped — the deterministic form of `stat.sampleBy`.
    */
  def stratifiedHashSample(df: DataFrame, stratum: Column, key: Column,
                           rates: Map[String, Double], salt: Long = 0L): DataFrame = {
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (s, r)) =>
      when(stratum === s, lit(r)).otherwise(acc)
    }
    df.filter(bucketHash(key, "stratified", salt) < (rateCol * Scale).cast("long"))
  }

  /** Deterministic train/validation/test split: one hash decides the
    * bucket, so membership is stable and the splits are disjoint and
    * exhaustive. `weights` need not be normalized.
    */
  def split(df: DataFrame, key: Column, weights: Seq[Double],
            salt: Long = 0L): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ > 0))
    val total = weights.sum
    // clamp the last bound to Scale: cumulative floating rounding could
    // otherwise leave a 1e-6 sliver of rows in no split.
    val bounds = weights.scanLeft(0.0)(_ + _)
      .map(w => (w / total * Scale).toLong)
      .init :+ Scale
    val h = bucketHash(key, "split", salt)
    bounds.sliding(2).map { case Seq(lo, hi) =>
      df.filter(h >= lit(lo) && h < lit(hi))
    }.toSeq
  }
}
