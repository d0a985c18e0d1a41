package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class AutocorrSpec extends SparkSpec {
  import spark.implicits._

  private def run(series: Seq[Long], lags: Seq[Int]) =
    Stats.autocorr(series.zipWithIndex.map { case (v, i) => ("s", i.toLong, v) }
        .toDF("m", "t", "v"), col("m"), col("t"), col("v"), lags)
      .collect().map(r => r.getInt(1) ->
        (r.getLong(2), r.getInt(3), r.getLong(4), r.getBoolean(5))).toMap

  test("perfect trend: lag-1 r = 1 exactly") {
    val m = run((1L to 10L).toSeq, Seq(1))
    assert(m(1) === ((9L, 1, 1000000L, true)))
  }

  test("perfect alternation: lag-1 r = -1, lag-2 r = +1") {
    val m = run(Seq(1L, 9L, 1L, 9L, 1L, 9L, 1L, 9L), Seq(1, 2))
    assert(m(1) === ((7L, -1, -1000000L, false))) // strong needs num > 0
    assert(m(2) === ((6L, 1, 1000000L, true)))
  }

  test("constant series: zero variance handled, nothing strong") {
    val m = run(Seq(4L, 4L, 4L, 4L, 4L), Seq(1))
    assert(m(1) === ((4L, 0, 0L, false)))
  }

  test("strong is exactly sign > 0 and r2_ppm >= 250000 (flooring cannot drift)") {
    // 4·num² >= d1·d2 <=> floor(10⁶·num²/(d1·d2)) >= 250000 on integers,
    // so the flag and the reported ppm must agree on every series
    for (s <- Seq(Seq(1L, 2L, 1L, 3L, 2L, 4L, 3L, 5L),
      Seq(5L, 1L, 5L, 2L, 5L, 1L), (1L to 12L).map(i => i * i % 7)))
      for ((_, (_, sign, r2, strong)) <- run(s, Seq(1, 2)))
        assert(strong === (sign > 0 && r2 >= 250000L))
  }
}
