package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM SEGMENTATION — the classic customer-value grid: per customer,
  * Recency (days since last order, relative to the corpus's latest
  * order date), Frequency (order count) and Monetary (total integer
  * cents), each scored 1–4 by quartile (recency reversed — recent is
  * good), then bucketed into named marketing segments.
  *
  * Output is the (r_score, f_score, m_score, segment) CELL GRID (≤ 64
  * rows) with customer counts and monetary sums — corpus-size
  * independent.
  *
  * Scale design: one keyed aggregate to the customer grain, exact
  * quartile cutoffs as a 1-row broadcast frame (recency/frequency live
  * on small integer domains; for a huge-domain monetary dimension at
  * extreme scale substitute the sketch path, as q_group_quantiles_sketch
  * does), then a broadcast score join and a ≤64-cell hash aggregate. No
  * global window anywhere: scoring is threshold comparison against the
  * broadcast cutoffs, not ntile ranking.
  */
object Rfm {

  /** Quartile score: 1 + #cutoffs strictly exceeded (higher = better). */
  private def scoreUp(v: Column, q: Column): Column =
    lit(1) + (v > q(0)).cast("int") + (v > q(1)).cast("int") +
      (v > q(2)).cast("int")

  def rfmCells(orders: DataFrame, customer: Column, orderDate: Column,
               amountCents: Column): DataFrame = {
    val per = orders.groupBy(customer.as("cust"))
      .agg(max(orderDate.cast("date")).as("last_dt"),
        count(lit(1)).as("f"), sum(amountCents).as("m"))
    val ref = per.agg(max("last_dt").as("ref_dt"))
    val withR = per.crossJoin(broadcast(ref))
      .withColumn("r_days", datediff(col("ref_dt"), col("last_dt")))
    val cuts = withR.agg(
      expr("percentile(r_days, array(0.25, 0.5, 0.75))").as("rq"),
      expr("percentile(f, array(0.25, 0.5, 0.75))").as("fq"),
      expr("percentile(m, array(0.25, 0.5, 0.75))").as("mq"))
    val scored = withR.crossJoin(broadcast(cuts))
      // recency reversed: most recent quartile scores 4
      .withColumn("r_score", lit(5) - scoreUp(col("r_days"), col("rq")))
      .withColumn("f_score", scoreUp(col("f"), col("fq")))
      .withColumn("m_score", scoreUp(col("m"), col("mq")))
      .withColumn("segment", expr(
        """CASE WHEN r_score = 4 AND f_score >= 4 AND m_score >= 4 THEN 'champion'
          |     WHEN r_score >= 3 AND f_score >= 3 THEN 'loyal'
          |     WHEN m_score >= 4 THEN 'big_spender'
          |     WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
          |     WHEN r_score <= 2 THEN 'hibernating'
          |     ELSE 'regular' END""".stripMargin))
    scored.groupBy("r_score", "f_score", "m_score", "segment")
      .agg(count(lit(1)).as("n_customers"), sum("m").as("m_cents"))
      .orderBy("r_score", "f_score", "m_score")
  }
}
