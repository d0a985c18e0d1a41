package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinProfileSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built profile: overlap split, exact size, skew headline") {
    // A: key 1 x3, key 2 x1, key 3 x2 (only in A)
    // B: key 1 x4, key 2 x5, key 9 x1 (only in B)
    val a = Seq(1L, 1L, 1L, 2L, 3L, 3L).toDF("k")
    val b = Seq(1L, 1L, 1L, 1L, 2L, 2L, 2L, 2L, 2L, 9L).toDF("k")
    val r = Relational.joinProfile(a, col("k"), b, col("k")).collect()(0)
    assert(r.getLong(0) === 3L) // ndv_a
    assert(r.getLong(1) === 3L) // ndv_b
    assert(r.getLong(2) === 2L) // both
    assert(r.getLong(3) === 1L) // only_a (key 3)
    assert(r.getLong(4) === 1L) // only_b (key 9)
    assert(r.getLong(5) === 17L) // 3*4 + 1*5
    assert(r.getLong(6) === 12L) // key 1
    assert(r.getLong(7) === 1L)
    assert(r.getLong(8) === 705882L) // 12e6 div 17
  }

  test("max-product ties resolve to the smallest key") {
    val a = Seq(1L, 1L, 2L, 2L).toDF("k")
    val b = Seq(1L, 2L).toDF("k")
    val r = Relational.joinProfile(a, col("k"), b, col("k")).collect()(0)
    assert(r.getLong(6) === 2L && r.getLong(7) === 1L)
  }

  test("profile predicts the actual join size on real tables") {
    val ev = table("events")
    val ords = table("orders")
    val r = Relational.joinProfile(ev, col("user_id"), ords,
      col("o_custkey")).collect()(0)
    val actual = ev.join(ords, col("user_id") === col("o_custkey")).count()
    assert(r.getLong(5) === actual)
    assert(r.getLong(0) === ev.select("user_id").distinct().count())
    assert(r.getLong(1) === ords.select("o_custkey").distinct().count())
  }
}
