package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AbcSpec extends SparkSpec {
  import spark.implicits._

  private def run(items: Seq[(Long, Long)]) =
    Stats.abcClasses(items.toDF("id", "v"), col("id"), col("v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

  test("hand case: boundaries are inclusive on the cumulative") {
    // values 50,30,15,4,1 (total 100): cum 50(A),80(A),95(B),99(C),100(C)
    val m = run(Seq((1L, 50L), (2L, 30L), (3L, 15L), (4L, 4L), (5L, 1L)))
    assert(m("A") === ((2L, 80L, 800000L)))
    assert(m("B") === ((1L, 15L, 150000L)))
    assert(m("C") === ((2L, 5L, 50000L)))
  }

  test("value ties classify deterministically by id") {
    // four equal items: cum 25/50/75/100 -> A,A,A(75<=80),C(100>95)
    val m = run(Seq((1L, 25L), (2L, 25L), (3L, 25L), (4L, 25L)))
    assert(m("A")._1 === 3L && m("C")._1 === 1L && !m.contains("B"))
  }

  test("part revenue classes conserve items and value; shares respect the cuts") {
    val pv = table("lineitem").groupBy(col("l_partkey"))
      .agg(expr("sum(CAST(round(l_extendedprice * 100) AS BIGINT))").as("v"))
    val out = Stats.abcClasses(pv, col("l_partkey"), col("v")).collect()
    assert(out.map(_.getLong(1)).sum === pv.count())
    assert(out.map(_.getLong(3)).sum >= 999998L) // floor slack < 3
    val m = out.map(r => r.getString(0) -> r).toMap
    // A's share sits just under its 80% cut (the last A item closes the
    // boundary); A+B just under 95%. The synthetic near-uniform revenue
    // means A holds MANY items — the class SHARE bounds are the
    // invariant, not an item-count shape.
    assert(m("A").getLong(3) <= 800000L)
    assert(m("A").getLong(3) + m("B").getLong(3) <= 950000L)
    assert(m("A").getLong(3) + m("B").getLong(3) >= 900000L)
  }
}
