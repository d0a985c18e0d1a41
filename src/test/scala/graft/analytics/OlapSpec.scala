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

  test("grouped mode via TopKPerKey k=1: count-desc with lang-asc tie-break") {
    val d = Seq(("s1", "en"), ("s1", "en"), ("s1", "de"), ("s1", "de"),
      ("s2", "fr")).toDF("source", "lang")
    val got = graft.plans.TopKPerKey.topK(
        d.groupBy("source", "lang").agg(count(lit(1)).as("n_mode")),
        Seq("source"), Seq(("n_mode", false), ("lang", true)), 1)
      .select("source", "lang", "n_mode")
      .as[(String, String, Long)].collect().toList.sorted
    assert(got === List(("s1", "de", 2L), ("s2", "fr", 1L)))
  }

  test("SpatialBins: known cells, exact micro sums, 4-in-1 pyramid nesting") {
    val pts = Seq(
      (10.0, 20.0, 1.5), (10.1, 20.1, 2.5),   // same coarse cell, nearby
      (10.0, 100.0, 4.0),                       // different cell_x
      (-10.0, 20.0, 8.0)                        // southern hemisphere
    ).toDF("lat", "lon", "v")
    val got = SpatialBins.binCounts(pts, col("lat"), col("lon"), col("v"), Seq(2, 4))
      .as[(Int, Long, Long, Long, Long)].collect().toList
    // res 2 (4 cells/axis): lat 10 → floor(100·4/180)=2; lon 20 → floor(200·4/360)=2;
    // lon 100 → floor(280·4/360)=3; lat −10 → floor(80·4/180)=1
    assert(got.filter(_._1 == 2).contains((2, 2L, 2L, 2L, 4000000L)))
    assert(got.filter(_._1 == 2).contains((2, 2L, 3L, 1L, 4000000L)))
    assert(got.filter(_._1 == 2).contains((2, 1L, 2L, 1L, 8000000L)))
    // pyramid invariant: every res-4 cell maps into its res-2 parent
    // (cell div 4) and per-parent counts agree
    val coarse = got.filter(_._1 == 2)
      .map(r => (r._2, r._3) -> r._4).toMap
    val fineByParent = got.filter(_._1 == 4)
      .groupBy(r => (r._2 / 4, r._3 / 4))
      .view.mapValues(_.map(_._4).sum).toMap
    assert(fineByParent === coarse)
  }

  test("SpatialBins computes every resolution in one scan via explode") {
    val pts = Seq((10.0, 20.0, 1.0)).toDF("lat", "lon", "v")
    val df = SpatialBins.binCounts(pts, col("lat"), col("lon"), col("v"),
      Seq(2, 4, 8))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert("Scan|LocalTableScan".r.findAllIn(plan).size <= 2,
      s"one pass per resolution:\n$plan")
  }

  test("rollupStats plans ONE shuffle via Expand, not one pass per level") {
    val df = Olap.rollupStats(docs, col("source"), col("lang"), col("tk"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), plan)
    // a rollup re-aggregating per level would scan the input 3 times
    assert("Scan|LocalTableScan".r.findAllIn(plan).size <= 2, plan)
  }

  test("aucExact: hand-computed Mann-Whitney AUC with tie credit") {
    // pos scores [3, 2, 2], neg scores [2, 1]. Pairwise: 3>2, 3>1 win;
    // each 2-vs-2 ties (half credit), each 2-vs-1 wins -> U = 5, AUC =
    // 5/6. Integer surface: auc_num = 10, auc_den = 12.
    val df = Seq((3.0, 1L), (2.0, 1L), (2.0, 1L), (2.0, 0L), (1.0, 0L))
      .toDF("s", "label")
    val got = Stats.aucExact(df, col("s"), col("label"))
      .as[(Long, Long, Long, Long)].head()
    assert(got === ((3L, 2L, 10L, 12L)))
    graft.CachePool.releaseAll()
  }

  test("aucExact: perfect ranker scores 1, inverted ranker 0, all-tied 1/2") {
    def auc(rows: Seq[(Double, Long)]): Double = {
      val r = Stats.aucExact(rows.toDF("s", "label"), col("s"), col("label"))
        .as[(Long, Long, Long, Long)].head()
      graft.CachePool.releaseAll()
      r._3.toDouble / r._4
    }
    assert(auc(Seq((2.0, 1L), (3.0, 1L), (0.0, 0L), (1.0, 0L))) === 1.0)
    assert(auc(Seq((0.0, 1L), (1.0, 1L), (2.0, 0L), (3.0, 0L))) === 0.0)
    assert(auc(Seq((1.0, 1L), (1.0, 1L), (1.0, 0L), (1.0, 0L))) === 0.5)
  }
}
