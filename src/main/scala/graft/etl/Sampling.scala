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

  /** Fixed-point scale for the temperature weights: √n in integer
    * 2⁻²⁰-ths. Everything after the (IEEE-exact) sqrt is integer
    * arithmetic, so the allocation is bit-identical on any engine.
    */
  private val WScale = 1L << 20

  /** Temperature-flattened per-source sampling targets — the dataset-mixing
    * step of training-corpus assembly: sampling proportionally to raw size
    * lets one giant crawl drown every curated source, so weights are
    * flattened to n^α with α = ½ (the canonical temperature; √n is chosen
    * because IEEE sqrt is correctly rounded, making the whole allocation
    * reproducible bit-for-bit — see below). `targetTotal` documents are
    * apportioned across sources by the largest-remainder (Hamilton)
    * method computed ENTIRELY in integers: scaled weight w̃ = ⌊√n · 2²⁰⌋,
    * base = (T·w̃) div Σw̃, and the T − Σbase leftover units go to the
    * largest integer remainders (source tie-break). No float ever crosses
    * an engine boundary, so an external oracle replays every target
    * exactly. The per-source frame is mixing CONFIG (dozens of domains,
    * not corpus rows); its windows are bounded by source cardinality.
    * Output: (source, n_docs, target), ordered by source.
    */
  def temperatureTargets(docs: DataFrame, source: Column,
                         targetTotal: Column): DataFrame = {
    val counts = docs.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n_docs"))
    val w = counts.withColumn("ws",
      floor(sqrt(col("n_docs").cast("double")) * WScale).cast("long"))
    val tot = w.agg(sum("ws").as("wsum"))
    val alloc = w.crossJoin(broadcast(tot))
      .withColumn("t", targetTotal.cast("long"))
      .withColumn("base", expr("(t * ws) div wsum"))
      .withColumn("rem", (col("t") * col("ws")) % col("wsum"))
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("source"))
    val deficit = alloc.agg((first("t") - sum("base")).as("deficit"))
    alloc.withColumn("rk", row_number().over(win))
      .crossJoin(broadcast(deficit))
      .select(col("source"), col("n_docs"),
        (col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L)).as("target"))
      .orderBy("source")
  }

  /** The sampled corpus itself: per source, the `target` documents with
    * the smallest `xxhash64(id, "mix", salt)` — a reproducible
    * pseudo-random draw, stable across partitionings and retries like
    * every sampler here. Scale shape: [[graft.plans.TopKPerKey]] first
    * bounds each source to the GLOBAL max target with map-side heaps
    * (≤ k rows per source per task reach the exchange), and only that
    * bounded frame sees the per-source rank window — never a window over
    * the raw corpus. A source whose target exceeds its size keeps every
    * row. Returns (selected frame, targets frame).
    */
  def temperatureMix(docs: DataFrame, id: Column, source: Column,
                     targetTotal: Column, salt: Long = 0L): (DataFrame, DataFrame) = {
    val targets = graft.CachePool.persist(
      temperatureTargets(docs, source, targetTotal))
    // the targets frame is mixing config — bounded by source cardinality;
    // collecting the single max is the same justified-driver-read as an
    // ANN index fit.
    val bounds = targets.agg(
        coalesce(max("target"), lit(0L)), coalesce(min("target"), lit(0L)))
      .collect()(0)
    val maxTarget = bounds.getLong(0)
    // a negative target can only mean t·w̃ wrapped Long (t·√n ≳ 8.8e12);
    // garbage allocations must fail loudly, not sample silently wrong
    require(bounds.getLong(1) >= 0L && maxTarget <= Int.MaxValue.toLong,
      s"temperatureMix allocation out of range (min=${bounds.getLong(1)}, " +
        s"max=$maxTarget): targetTotal·√n overflows the integer apportionment")
    if (maxTarget <= 0L) (docs.limit(0).select(id.as("doc_id"), source.as("source")), targets)
    else {
      val keyed = docs.select(id.as("doc_id"), source.as("source"),
        xxhash64(id, lit("mix"), lit(salt)).as("__tm_h"))
      val capped = graft.plans.TopKPerKey.topK(
        keyed, Seq("source"), Seq(("__tm_h", true), ("doc_id", true)), maxTarget.toInt)
      val win = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("__tm_h"), col("doc_id"))
      val ranked = capped.withColumn("__tm_rk", row_number().over(win))
      val sel = ranked.join(broadcast(targets.select("source", "target")), "source")
        .filter(col("__tm_rk") <= col("target"))
        .select("doc_id", "source")
      (sel, targets)
    }
  }

  /** Driver-graded mixing summary: (source, n_docs, target, n_selected)
    * where n_selected counts the rows [[temperatureMix]] actually
    * selected — the oracle replays the integer allocation and pins
    * n_selected = least(target, n_docs).
    */
  def temperatureMixSummary(docs: DataFrame, id: Column, source: Column,
                            targetTotal: Column, salt: Long = 0L): DataFrame = {
    val (sel, targets) = temperatureMix(docs, id, source, targetTotal, salt)
    val selCounts = sel.groupBy("source").agg(count(lit(1)).as("n_selected"))
    targets.join(selCounts, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("target"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"))
      .orderBy("source")
  }
}
