package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DigitLawSpec extends SparkSpec {
  import spark.implicits._

  test("benford constants sum to exactly 1e6") {
    assert(DigitLaw.BenfordPpm.map(_._2).sum === 1000000L)
    assert(DigitLaw.BenfordPpm.map(_._1) === (1 to 9))
  }

  test("first-digit fold: decades, non-positives excluded, 9-row grid") {
    val vals = Seq(1L, 9L, 10L, 99L, 100L, 5L, 123456789L, 987654321012L,
      -5L, 0L).toDF("amt")
    val out = DigitLaw.benford(vals, col("amt"), "t").collect()
    assert(out.length === 9)
    val byDigit = out.map(r => r.getInt(1) -> r.getLong(2)).toMap
    assert(byDigit(1) === 4L) // 1, 10, 100, 123456789
    assert(byDigit(9) === 3L) // 9, 99, 987654321012
    assert(byDigit(5) === 1L)
    assert(byDigit(2) === 0L) // absent digits appear with 0
    assert(out.forall(_.getLong(3) === 8L)) // n excludes -5 and 0
  }

  test("a benford-conforming sample passes; a uniform one rejects") {
    // conforming: replicate each digit proportionally to its ppm / 1000
    val conforming = DigitLaw.BenfordPpm.flatMap { case (d, p) =>
      Seq.fill((p / 1000).toInt)(d.toLong)
    }
    val ok = DigitLaw.benford(conforming.toDF("amt"), col("amt"), "c")
      .collect()
    assert(ok.forall(!_.getBoolean(8)), "conforming sample must not reject")
    // uniform digits 1..9, 111 each -> chi2 ~ 600 >> 15.5
    val uniform = (1 to 9).flatMap(d => Seq.fill(111)(d.toLong))
    val bad = DigitLaw.benford(uniform.toDF("amt"), col("amt"), "u")
      .collect()
    assert(bad.forall(_.getBoolean(8)), "uniform sample must reject")
    // chi2 is constant across a source's rows
    assert(bad.map(_.getLong(7)).distinct.length === 1)
  }

  test("a source with no positive amounts reports chi2 0 and no rejection") {
    val out = DigitLaw.benford(Seq(-1L, 0L).toDF("amt"), col("amt"), "e")
      .collect()
    assert(out.length === 9)
    assert(out.forall(r => r.getLong(3) === 0L && r.getLong(7) === 0L &&
      !r.getBoolean(8)))
  }
}
