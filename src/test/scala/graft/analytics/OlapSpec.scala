package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class OlapSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("s1", "en", 2L), ("s1", "en", 3L), ("s1", "de", 5L),
    ("s2", "en", 7L)
  ).toDF("source", "lang", "tk")

  test("rollupStats emits leaf, subtotal and grand-total rows with exact sums") {
    val got = Olap.rollupStats(docs, col("source"), col("lang"), col("tk"))
      .as[(Long, String, String, Long, Long)].collect().toList
    assert(got === List(
      (0L, "s1", "de", 1L, 5L),
      (0L, "s1", "en", 2L, 5L),
      (0L, "s2", "en", 1L, 7L),
      (1L, "s1", "<all>", 3L, 10L),
      (1L, "s2", "<all>", 1L, 7L),
      (3L, "<all>", "<all>", 4L, 17L)))
  }

  test("pivotCounts is dense: missing combinations are 0, not null") {
    val got = Olap.pivotCounts(docs, col("source"), col("lang"), Seq("de", "en", "fr"))
      .as[(String, Long, Long, Long)].collect().toList
    assert(got === List(("s1", 1L, 2L, 0L), ("s2", 0L, 1L, 0L)))
  }

  test("cubeStats adds the cross-dimension marginal rollup lacks") {
    val got = Olap.cubeStats(docs, col("source"), col("lang"), col("tk"))
      .as[(Long, String, String, Long, Long)].collect().toList
    assert(got === List(
      (0L, "s1", "de", 1L, 5L),
      (0L, "s1", "en", 2L, 5L),
      (0L, "s2", "en", 1L, 7L),
      (1L, "s1", "<all>", 3L, 10L),
      (1L, "s2", "<all>", 1L, 7L),
      (2L, "<all>", "de", 1L, 5L),   // the per-lang marginal — CUBE-only
      (2L, "<all>", "en", 3L, 12L),
      (3L, "<all>", "<all>", 4L, 17L)))
  }

  test("cubeStats still plans ONE Expand pass, not one scan per grouping set") {
    val df = Olap.cubeStats(docs, col("source"), col("lang"), col("tk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    assert("Scan|LocalTableScan".r.findAllIn(plan).size <= 2, plan)
  }

  test("rollupStats plans ONE shuffle via Expand, not one pass per level") {
    val df = Olap.rollupStats(docs, col("source"), col("lang"), col("tk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    // a rollup re-aggregating per level would scan the input 3 times
    assert("Scan|LocalTableScan".r.findAllIn(plan).size <= 2, plan)
  }
}
