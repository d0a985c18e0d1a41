package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CohortLtvSpec extends SparkSpec {
  import spark.implicits._

  private def wk(w: Long) = new Timestamp(w * 604800000L + 1000L)

  test("cohorting, offsets, cumulative and cohort size on a hand log") {
    val orders = Seq(
      (1L, wk(100), 500L), (1L, wk(100), 300L), (1L, wk(102), 200L),
      (2L, wk(100), 100L),
      (3L, wk(101), 700L), (3L, wk(102), 50L)
    ).toDF("cust", "t", "cents")
    val out = EventAnalytics.cohortLtv(orders, col("cust"), col("t"),
      col("cents")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // cohort 100: offset 0 = users {1,2} rev 900; offset 2 = {1} rev 200
    assert(out((100L, 0L)) === ((2L, 900L, 900L, 2L)))
    assert(out((100L, 2L)) === ((1L, 200L, 1100L, 2L)))
    // cohort 101: offset 0 rev 700, offset 1 rev 50
    assert(out((101L, 0L)) === ((1L, 700L, 700L, 1L)))
    assert(out((101L, 1L)) === ((1L, 50L, 750L, 1L)))
    assert(out.size === 4)
  }

  test("grid conserves revenue and buyers on the orders table") {
    val o = table("orders")
    val out = EventAnalytics.cohortLtv(o, col("o_custkey"),
      col("o_orderdate"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)")).collect()
    val totalCents = o.select(
      expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))"))
      .collect()(0).getLong(0)
    assert(out.map(_.getLong(3)).sum === totalCents)
    // every cohort's last cumulative equals its revenue sum
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      assert(sorted.last.getLong(4) === sorted.map(_.getLong(3)).sum)
      // offset 0 exists and defines cohort_size everywhere
      assert(sorted.head.getLong(1) === 0L)
      val size = sorted.head.getLong(2)
      assert(rows.forall(_.getLong(5) === size))
    }
  }
}
