package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GiniSpec extends SparkSpec {
  import spark.implicits._

  private def gini(vs: Seq[Long]): Long =
    Stats.giniPpm(vs.zipWithIndex.map { case (v, i) => (v, i.toLong) }
        .toDF("v", "k"), col("v"), col("k"), "t")
      .collect()(0).getLong(3)

  test("closed-form cases") {
    // perfectly equal -> 0
    assert(gini(Seq(5L, 5L, 5L, 5L)) === 0L)
    // one row holds everything, n=4 -> (n-1)/n = 750000
    assert(gini(Seq(0L, 0L, 0L, 100L)) === 750000L)
    // {1,2,3,4}: sum=10, sum i*x = 1+4+9+16=30, (2*30-5*10)/(4*10)=0.25
    assert(gini(Seq(1L, 2L, 3L, 4L)) === 250000L)
    // tie order cannot matter
    assert(gini(Seq(3L, 1L, 3L, 1L)) === gini(Seq(1L, 3L, 1L, 3L)))
  }

  test("matches a local computation on the per-user event counts") {
    val counts = table("events").groupBy("user_id").count()
      .collect().map(_.getLong(1)).sorted
    val n = counts.length.toLong
    val tot = counts.sum
    val iw = counts.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    val expected = (BigInt(2) * BigInt(iw) - BigInt(n + 1) * BigInt(tot)) *
      1000000 / (BigInt(n) * BigInt(tot))
    val got = Stats.giniPpm(table("events").groupBy(col("user_id"))
        .agg(count(lit(1)).as("v")), col("v"), col("user_id"), "t")
      .collect()(0)
    assert(got.getLong(3) === expected.toLong)
    assert(got.getLong(1) === n && got.getLong(2) === tot)
  }
}
