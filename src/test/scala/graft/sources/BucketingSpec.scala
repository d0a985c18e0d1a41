package graft.sources

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  /** Force the sort-merge path so the presence/absence of the shuffle is
    * the bucketing effect, not a broadcast of these tiny test tables.
    */
  private def withoutBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("joining two same-bucketed tables sort-merges with no shuffle on either side") {
    withoutBroadcast {
      Seq("b_orders", "b_lineitem").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val loc = new java.io.File(
          s"${System.getProperty("java.io.tmpdir")}/graft-warehouse/$t")
        if (loc.exists()) {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
          }
          rm(loc)
        }
      }
      Bucketing.writeBucketed(
        table("orders").select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", "o_orderkey", 8, sortCols = Seq("o_orderkey"))
      Bucketing.writeBucketed(
        table("lineitem").select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 8, sortCols = Seq("o_orderkey"))

      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      assert(joined.count() === table("lineitem").count()) // FK join keeps lineitem rows

      val plan = joined.queryExecution.executedPlan
      assert(collect(plan) { case j: SortMergeJoinExec => j }.nonEmpty, plan.toString)
      val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
      assert(shuffles.isEmpty, s"bucketed join should not shuffle, found: $shuffles")
    }
  }

  test("the same join over plain parquet shuffles both sides (the cost bucketing removes)") {
    withoutBroadcast {
      val plain = table("orders").select("o_orderkey")
        .join(table("lineitem").select(col("l_orderkey").as("o_orderkey")), "o_orderkey")
      plain.count()
      val shuffles = collect(plain.queryExecution.executedPlan) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.size === 2, s"expected both sides shuffled: $shuffles")
    }
  }
}
