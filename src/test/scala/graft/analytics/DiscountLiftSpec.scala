package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DiscountLiftSpec extends SparkSpec {
  import spark.implicits._

  test("lift signs, means and concordance on a hand-built curve") {
    // disc 0%: qty mean 2.0; 5%: mean 3.0; 10%: mean 1.0
    val rows = Seq((0.0, 2.0), (0.0, 2.0), (0.05, 3.0), (0.05, 3.0),
      (0.10, 1.0))
    val out = Relational.discountLift(rows.toDF("d", "q"), col("d"), col("q"))
      .collect().map(r => r.getInt(0) -> r).toMap
    assert(out(0).getLong(3) === 2000000L) // mean 2.0 in micro-units
    assert(out(5).getInt(4) === 1)       // 3.0 > 2.0
    assert(out(10).getInt(4) === -1)     // 1.0 < 2.0
    assert(out(0).getInt(4) === 0)
    // pairs: (0,5) up, (0,10) down, (5,10) down
    assert(out(0).getLong(5) === 1L && out(0).getLong(6) === 2L)
  }

  test("bucket frame covers the discount grid and conserves rows") {
    val li = table("lineitem")
    val out = Relational.discountLift(li, col("l_discount"),
      col("l_quantity")).collect()
    assert(out.map(_.getLong(1)).sum === li.count())
    assert(out.length <= 101)
    // concordant + discordant <= pair count (ties allowed)
    val k = out.length.toLong
    assert(out(0).getLong(5) + out(0).getLong(6) <= k * (k - 1) / 2)
  }

  test("a curve without a zero-discount baseline survives with null lift") {
    val rows = Seq((0.05, 2.0), (0.05, 2.0), (0.10, 3.0))
    val out = Relational.discountLift(rows.toDF("d", "q"), col("d"), col("q"))
      .collect()
    assert(out.length === 2)
    assert(out.forall(_.isNullAt(4)))
    assert(out.map(_.getLong(1)).sum === 3L)
  }
}
