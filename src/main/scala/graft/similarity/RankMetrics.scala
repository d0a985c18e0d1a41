package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retrieval EVALUATION metrics over shortlist frames — the measurement
  * half of the ANN/retrieval family: given a system's top-k shortlist and
  * a gold answer per query, report hit rate (recall@k) and MRR. Every
  * output is an exact integer: the reciprocal rank sums as `k!/rank`
  * (integral for every rank ≤ k), so the aggregate is order-free and
  * engine-replayable — MRR itself is `mrr_num / mrr_den`,
  * driver-derivable. The same fraction discipline as the drift and
  * winsorized rows: no float ever crosses the gate.
  *
  * Shape: one equi-join of the k-bounded shortlist frame to the gold
  * frame on the query id, one query-keyed partial aggregate, one global
  * fold — cost lives in whatever PRODUCED the shortlist, never here.
  */
object RankMetrics {

  /** One metrics row over `shortlist` (query_id, rnk, neighbor_id) and
    * `gold` (query_id, gold_id): (k, n_queries, n_hit, mrr_num, mrr_den)
    * with MRR = mrr_num/mrr_den and recall@k = n_hit/n_queries. Queries
    * in `gold` with no shortlist row count as misses.
    */
  def mrrAtK(shortlist: DataFrame, gold: DataFrame, k: Int): DataFrame = {
    require(k >= 1 && k <= 10, "k! must stay integral and small")
    val kFact = (1L to k.toLong).product
    val ranks = gold.join(shortlist, Seq("query_id"), "left")
      .groupBy("query_id")
      .agg(min(when(col("neighbor_id") === col("gold_id"), col("rnk")))
        .as("gold_rank"))
    ranks.agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("gold_rank").isNotNull, 1L).otherwise(0L)).as("n_hit"),
        sum(coalesce(expr(s"${kFact}L div gold_rank"), lit(0L))).as("mrr_num"))
      .select(lit(k.toLong).as("k"), col("n_queries"), col("n_hit"),
        col("mrr_num"), (col("n_queries") * kFact).as("mrr_den"))
  }
}
