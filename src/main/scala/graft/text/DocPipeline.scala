package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.ExactDedup

/** End-to-end training-corpus preparation over the documents table — the
  * §2.2 counterpart of the reference's geo pipeline: one composed Catalyst
  * plan, no intermediate materialization.
  *
  *   normalize → quality features → filter → exact dedup (keep min id)
  *   → per-language corpus stats.
  *
  * Determinism: the aggregate emits counts, integer sums and min/max of a
  * per-row deterministic score — never an order-dependent double sum.
  */
object DocPipeline {

  /** Per-row quality features + score (same definitions as
    * [[TextAnalysis.qualityScore]], inlined so everything fuses).
    */
  def withQuality(docs: DataFrame, text: Column): DataFrame =
    docs
      .withColumn("n_chars_c", length(text))
      .withColumn("n_tokens", size(TextAnalysis.tokens(text)))
      .withColumn("n_alpha", length(regexp_replace(text, "[^A-Za-z]", "")))
      .withColumn("n_punct", length(regexp_replace(text, "[A-Za-z0-9\\s]", "")))
      .withColumn("n_stop", TextAnalysis.markerScore(
        TextAnalysis.tokens(text), TextAnalysis.Markers.head._2))
      .withColumn("quality_score",
        (col("n_stop").cast("double") / col("n_tokens")) * 2.0 +
          (col("n_alpha").cast("double") / col("n_chars_c")) -
          (col("n_punct").cast("double") / col("n_chars_c")) * 3.0 +
          when(col("n_tokens").between(20, 200), 0.5).otherwise(0.0))

  /** Quality gate: droppable docs are too short, too long, or punctuation
    * soup. Thresholds are pipeline parameters, not truths.
    */
  def qualityFilter(minTokens: Int = 5, maxTokens: Int = 5000,
                    maxPunctRatio: Double = 0.2): Column =
    col("n_tokens").between(minTokens, maxTokens) &&
      (col("n_punct").cast("double") / col("n_chars_c")) <= maxPunctRatio

  /** The cleaned, deduplicated corpus with quality features attached. */
  def corpus(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val featured = withQuality(docs, text).filter(qualityFilter())
    ExactDedup.dedup(featured, text, id)
  }

  /** Per-language corpus statistics over the deduplicated corpus. */
  def corpusStats(docs: DataFrame, id: Column, text: Column): DataFrame =
    corpus(docs, id, text)
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("sum_tokens"),
        min(col("quality_score")).as("min_q"),
        max(col("quality_score")).as("max_q"))
      .orderBy("lang")
}
