package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ExperimentSpec extends SparkSpec {
  import spark.implicits._

  test("chi-square decision on hand-built contingency tables") {
    // metric m1: 30/100 vs 10/100 -> chi2 = 12.5, significant
    // metric m2: 11/100 vs 9/100  -> chi2 ~ 0.22, not significant
    val cont = Seq(
      ("m1", 0L, 100L, 10L), ("m1", 1L, 100L, 30L),
      ("m2", 0L, 100L, 9L), ("m2", 1L, 100L, 11L)
    ).toDF("metric", "variant", "n", "conv")
    val out = Experiment.chiSquare(cont).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("m1").getAs[Boolean]("significant"))
    assert(!out("m2").getAs[Boolean]("significant"))
    assert(out("m1").getAs[Long]("ppm_trt") === 300000L)
    assert(out("m1").getAs[Long]("ppm_ctl") === 100000L)
    assert(out("m1").getAs[Long]("lift_ppm") === 200000L)
    assert(out("m2").getAs[Long]("lift_ppm") === 20000L)
  }

  test("strong symmetric effect is significant") {
    // a=70,b=30,c=30,d=70: N=200, ad-bc=4000,
    // chi2 = 200*16e6/(100*100*100*100) = 32 -> significant
    val cont = Seq(
      ("m", 0L, 100L, 30L), ("m", 1L, 100L, 70L)
    ).toDF("metric", "variant", "n", "conv")
    assert(Experiment.chiSquare(cont).collect()(0)
      .getAs[Boolean]("significant"))
  }

  test("row-level abTest path aggregates trials once and matches") {
    // 40 treatment trials with 20 conversions vs 40 control with 4
    val rows = (0 until 40).flatMap { i =>
      Seq(("m", 1L, i % 2 == 0, i), ("m", 0L, i % 10 == 0, i + 1000))
    }
    val trials = rows.toDF("metric", "variant", "conv", "id")
    val out = Experiment.abTest(trials, col("metric"), col("variant"),
      col("conv")).collect()(0)
    assert(out.getAs[Long]("n_trt") === 40L)
    assert(out.getAs[Long]("conv_trt") === 20L)
    assert(out.getAs[Long]("conv_ctl") === 4L)
    // chi2 = 80*(20*36-20*4)^2/(40*40*24*56) ~ 15.2 -> significant
    assert(out.getAs[Boolean]("significant"))
  }

  test("null split on the events table stays balanced") {
    val ev = table("events")
    val out = Experiment.abTest(ev, lit("all"), col("user_id") % 2,
      col("event_type") === "purchase").collect()(0)
    assert(out.getAs[Long]("n_ctl") + out.getAs[Long]("n_trt") === ev.count())
    // both arms populated and rates in a plausible band around 1/5
    assert(out.getAs[Long]("ppm_ctl") > 100000L)
    assert(out.getAs[Long]("ppm_trt") > 100000L)
  }

  test("degenerate tables are never significant") {
    val cont = Seq(
      ("zero_conv", 0L, 100L, 0L), ("zero_conv", 1L, 100L, 0L),
      ("full_conv", 0L, 100L, 100L), ("full_conv", 1L, 100L, 100L),
      ("empty_arm", 0L, 100L, 10L), ("empty_arm", 1L, 0L, 0L)
    ).toDF("metric", "variant", "n", "conv")
    val out = Experiment.chiSquare(cont).collect()
      .map(r => r.getString(0) -> r.getAs[Boolean]("significant")).toMap
    assert(out.values.forall(_ == false), out.toString)
  }
}
