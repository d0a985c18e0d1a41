package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CusumSpec extends SparkSpec {
  import spark.implicits._

  private def run(series: Map[String, Seq[Long]], h: Long = 330000L) =
    EventAnalytics.cusumShift(
      series.toSeq.flatMap { case (m, cs) =>
        cs.zipWithIndex.map { case (c, i) => (m, i.toLong, c) }
      }.toDF("m", "day", "c"), col("m"), col("day"), col("c"), h)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(6),
          r.getLong(7), r.getBoolean(8))).toMap

  test("constant series: zero deviations, no shift, cp unset") {
    val m = run(Map("flat" -> Seq(5L, 5L, 5L, 5L)))
    val (n, up, down, ratio, cp, det) = m("flat")
    assert(n === 4L && up === 0L && down === 0L && ratio === 0L &&
      cp === -1L && !det)
  }

  test("upward level shift detected at the shift day; downward mirrors") {
    // 10 days at 10, then 10 days at 30: strong upward shift
    val up = run(Map("u" -> (Seq.fill(10)(10L) ++ Seq.fill(10)(30L))))
    val (_, smaxU, _, ratioU, cpU, detU) = up("u")
    assert(detU && ratioU === 500000L)
    assert(cpU === 19L) // the aligned run keeps growing to the last day
    assert(smaxU > 0L)
    // mirrored series flags via the downward statistic with the same ratio
    val dn = run(Map("d" -> (Seq.fill(10)(30L) ++ Seq.fill(10)(10L))))
    val (_, _, smaxD, ratioD, _, detD) = dn("d")
    assert(detD && ratioD === 500000L && smaxD > 0L)
  }

  test("hand-checked fold: values match the direct recurrence") {
    val cs = Seq(3L, 1L, 4L, 1L, 5L)
    val t = cs.length.toLong; val tot = cs.sum
    var su = 0L; var mu = 0L; var sd = 0L; var md = 0L; var ad = 0L
    for (c <- cs) {
      val d = t * c - tot; ad += math.abs(d)
      su = math.max(0L, su + d); mu = math.max(mu, su)
      sd = math.max(0L, sd - d); md = math.max(md, sd)
    }
    val m = run(Map("x" -> cs))
    assert(m("x")._2 === mu && m("x")._3 === md)
    assert(m("x")._4 === math.max(mu, md) * 1000000L / ad)
  }
}
