package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("pointInInterval equals the theta join, each pair exactly once") {
    val points = table("customer").select(col("c_custkey"), col("c_acctbal"))
    val intervals = table("supplier").select(col("s_suppkey"),
      col("s_acctbal").as("lo"), (col("s_acctbal") + 500.0).as("hi"))

    val blocked = RangeJoin.pointInInterval(points, "c_acctbal", intervals, "lo", "hi", 500.0)
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSeq
    val theta = points.join(intervals,
        col("c_acctbal") >= col("lo") && col("c_acctbal") <= col("hi"))
      .select("c_custkey", "s_suppkey").as[(Long, Long)].collect().toSeq

    assert(blocked.sorted === theta.sorted) // Seq equality: no dup pairs either
  }

  test("intervals wider than one bucket still match points in every covered bucket") {
    val points = Seq((1L, 0.5), (2L, 5.5), (3L, 9.5), (4L, 10.5)).toDF("pid", "x")
    val intervals = Seq((100L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(points, "x", intervals, "lo", "hi", 2.0)
      .select("pid").as[Long].collect().sorted.toSeq
    assert(got === Seq(1L, 2L, 3L)) // 10.5 outside [0, 10]
  }
}
