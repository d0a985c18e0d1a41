package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval fusion — Reciprocal Rank Fusion (Cormack et al.,
  * SIGIR'09) over a per-query candidate shortlist and a second ranking
  * signal (a lexical retriever, a quality prior, a recency score):
  *
  *   rrf(c) = 1/(K + rank_retriever(c)) + 1/(K + rank_signal(c))
  *
  * the standard production shape for "vector relevance × document
  * prior" ranking. Rank fusion beats score fusion operationally because
  * ranks need no cross-retriever score calibration — and it grades
  * exactly: ranks are integers, and the RRF value is a fixed tree of
  * IEEE divisions of integers, bit-reproducible by any engine.
  *
  * Scale shape: the candidate frame is shortlists — k rows per query,
  * NOT the corpus — so the per-query rank windows here run over
  * k-bounded partitions (the retriever already did the corpus-scale
  * work through its own bounded-heap / banded paths). The prior joins
  * in by candidate id, one row per candidate.
  */
object HybridSearch {

  /** Fuse a `(query_id, rnk, neighbor_id)` retriever shortlist with a
    * per-document prior `(id, prior_score)`: rank the prior WITHIN each
    * query's shortlist (prior DESC, id ASC — a strict total order), RRF
    * the two ranks, keep the top `k` per query by (rrf DESC, id ASC).
    * Output: (query_id, fused_rank, neighbor_id, retriever_rank,
    * prior_rank) — integer ranks only, engine-replayable.
    */
  def rrfFuse(shortlist: DataFrame, prior: DataFrame,
              k: Int, rrfK: Int = 60): DataFrame = {
    require(k > 0 && rrfK > 0)
    val wPrior = Window.partitionBy("query_id")
      .orderBy(col("prior_score").desc, col("neighbor_id"))
    val wFused = Window.partitionBy("query_id")
      .orderBy(col("__hs_rrf").desc, col("neighbor_id"))
    shortlist
      .join(prior.select(col("id").as("neighbor_id"), col("prior_score")),
        "neighbor_id")
      .withColumn("prior_rank", row_number().over(wPrior).cast("long"))
      // the exact expression tree the oracle replays: two IEEE divisions
      // of exact integers, one addition
      .withColumn("__hs_rrf",
        lit(1.0) / (lit(rrfK) + col("rnk")) +
          lit(1.0) / (lit(rrfK) + col("prior_rank")))
      .withColumn("fused_rank", row_number().over(wFused).cast("long"))
      .filter(col("fused_rank") <= k)
      .select(col("query_id"), col("fused_rank"), col("neighbor_id"),
        col("rnk").cast("long").as("retriever_rank"), col("prior_rank"))
      .orderBy("query_id", "fused_rank")
  }
}
