package graft.plans

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKPerKeySpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("topK matches the window row_number formulation exactly") {
    val li = table("lineitem")
    val got = TopKPerKey.topK(li,
        keyCols = Seq("l_suppkey"),
        orderBy = Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)),
        k = 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .as[(Long, Long, Int, Double)].collect().toSet

    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_quantity").desc, col("l_orderkey"), col("l_linenumber"))
    val expected = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity")
      .as[(Long, Long, Int, Double)].collect().toSet

    assert(got === expected)
  }

  test("plans as partial heap → shuffle → final heap") {
    val df = TopKPerKey.topK(table("lineitem"), Seq("l_suppkey"),
      Seq(("l_quantity", false), ("l_orderkey", true), ("l_linenumber", true)), 3)
    df.collect()
    val plan = df.queryExecution.executedPlan
    val execs = collect(plan) { case t: TopKPerKeyExec => t }
    assert(execs.map(_.partial).sorted === Seq(false, true), plan.toString)
    assert(collect(plan) { case s: ShuffleExchangeExec => s }.size === 1, plan.toString)
  }

  test("k larger than any group passes everything through") {
    val df = Seq((1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val got = TopKPerKey.topK(df, Seq("k"), Seq(("v", false)), 100).count()
    assert(got === 3L)
  }
}
