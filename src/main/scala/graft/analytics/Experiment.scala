package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Controlled-experiment (A/B test) analysis — the two-proportion
  * contingency test every event-logging product runs continuously:
  * trials carry a variant (0 = control, 1 = treatment) and a conversion
  * flag; per metric the engine reports both arms' trial/conversion
  * counts, integer-ppm conversion rates, the treatment lift in ppm, and
  * a Pearson chi-square significance decision at α = 0.05.
  *
  * The decision is EXACT fixed-point arithmetic, no float division:
  * χ² ≥ 3.841459 (the 95% critical value of χ²₁) is evaluated as the
  * cross-multiplied integer comparison
  *
  *   10⁶ · N · (ad − bc)²  ≥  3841459 · (a+b)(c+d)(a+c)(b+d)
  *
  * over DECIMAL(38,0) (the oracle replays it over HUGEINT — both sides
  * are exact integers in both engines), where a/b = treatment
  * conversions/non-conversions and c/d = control's. DECIMAL(38,0) holds
  * the products exactly to N ≈ 4·10⁶ trials per metric; a 100 TB log
  * feeds the test through [[contingency]]'s pre-aggregation, and beyond
  * that N the caller should stratify or subsample — statistical power
  * saturates orders of magnitude earlier.
  *
  * Scale design: [[contingency]] is ONE hash aggregate with map-side
  * combine (2 rows per metric out); [[chiSquare]] runs scalar
  * expressions and a #metrics-row pivot — nothing after the first
  * aggregate ever sees the corpus.
  */
object Experiment {

  /** Collapse row-level trials to the per-(metric, variant) contingency
    * counts: `n` trials, `conv` conversions. The only corpus-sized op. */
  def contingency(trials: DataFrame, metric: Column, variant: Column,
                  converted: Column): DataFrame =
    trials.groupBy(metric.as("metric"), variant.as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(when(converted, lit(1L)).otherwise(lit(0L))).as("conv"))

  /** Per-metric test over a (metric, variant, n, conv) contingency
    * frame: pivots the two arms side by side and appends ppm rates, the
    * lift, and the exact chi-square decision. Input is metric-count
    * sized, never corpus sized.
    */
  def chiSquare(cont: DataFrame): DataFrame = {
    val arms = cont.groupBy("metric").agg(
      sum(when(col("variant") === 0, col("n")).otherwise(0L)).as("n_ctl"),
      sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("conv_ctl"),
      sum(when(col("variant") === 1, col("n")).otherwise(0L)).as("n_trt"),
      sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("conv_trt"))
    arms
      .withColumn("ppm_ctl", expr("conv_ctl * 1000000 div n_ctl"))
      .withColumn("ppm_trt", expr("conv_trt * 1000000 div n_trt"))
      .withColumn("lift_ppm", col("ppm_trt") - col("ppm_ctl"))
      // exact integer chi-square decision; every operand cast BEFORE any
      // product so no BIGINT intermediate can overflow. A degenerate
      // table (empty arm, zero conversions everywhere, or 100%
      // conversion) has a zero margin product: chi-square is undefined
      // there and the decision must be FALSE, not the vacuous 0 >= 0.
      // Past N ≈ 4·10⁶ trials the DECIMAL(38,0) products overflow to
      // NULL in non-ANSI Spark while the HUGEINT oracle stays exact, so
      // the exactness bound fails loudly instead of diverging silently.
      .withColumn("significant", expr(
        """CASE WHEN n_ctl + n_trt > 4000000
          |THEN raise_error(CONCAT('chiSquare: N exceeds the DECIMAL(38,0) ',
          |  'exactness bound (4e6 trials/metric); stratify or subsample: ',
          |  CAST(n_ctl + n_trt AS STRING))) ELSE
          |CAST(n_trt AS DECIMAL(38,0)) * CAST(n_ctl AS DECIMAL(38,0)) *
          |  CAST(conv_ctl + conv_trt AS DECIMAL(38,0)) *
          |  CAST(n_ctl + n_trt - conv_ctl - conv_trt AS DECIMAL(38,0)) > 0
          |AND
          |CAST(1000000 AS DECIMAL(38,0)) * CAST(n_ctl + n_trt AS DECIMAL(38,0)) *
          |  (CAST(conv_trt AS DECIMAL(38,0)) * CAST(n_ctl - conv_ctl AS DECIMAL(38,0)) -
          |   CAST(n_trt - conv_trt AS DECIMAL(38,0)) * CAST(conv_ctl AS DECIMAL(38,0))) *
          |  (CAST(conv_trt AS DECIMAL(38,0)) * CAST(n_ctl - conv_ctl AS DECIMAL(38,0)) -
          |   CAST(n_trt - conv_trt AS DECIMAL(38,0)) * CAST(conv_ctl AS DECIMAL(38,0)))
          |>= CAST(3841459 AS DECIMAL(38,0)) *
          |  CAST(n_trt AS DECIMAL(38,0)) * CAST(n_ctl AS DECIMAL(38,0)) *
          |  CAST(conv_ctl + conv_trt AS DECIMAL(38,0)) *
          |  CAST(n_ctl + n_trt - conv_ctl - conv_trt AS DECIMAL(38,0))
          |END""".stripMargin))
      .orderBy("metric")
  }

  /** Row-level convenience: [[contingency]] then [[chiSquare]]. */
  def abTest(trials: DataFrame, metric: Column, variant: Column,
             converted: Column): DataFrame =
    chiSquare(contingency(trials, metric, variant, converted))

  /** MANN–WHITNEY U — the rank-based (nonparametric) two-sample test:
    * does the treatment arm's continuous metric stochastically dominate
    * control's, without assuming normality? Entirely exact integer
    * arithmetic on DOUBLED midranks (ties get the average rank; doubling
    * keeps .5 midranks integral): per metric,
    *
    *   R1·2 = Σ_{treatment} (2·startRank + tieCount − 1)
    *   U·2  = R1·2 − n1·(n1+1)
    *
    * and the α = 0.05 two-sided decision via the cross-multiplied
    * normal-approximation z² ≥ 3.841459:
    *
    *   3·10⁶·(U·2 − n1·n2)² ≥ 3841459·n1·n2·(n+1)
    *
    * over DECIMAL(38,0) (HUGEINT in oracles). The tie CORRECTION to σ²
    * is omitted (documented; it only shrinks σ, so the decision is
    * conservative for heavily-tied data). Also reported: u2 (doubled U),
    * the arm sizes, and the rank-biserial effect direction.
    *
    * Scale design: values collapse to the per-(metric, value) tie-group
    * frame first (one hash aggregate carrying both arms' counts); start
    * ranks come from the range-sort shape (range partition on value,
    * per-partition cumsums, broadcast offsets — never a global rank
    * window); everything after is a per-metric aggregate.
    */
  def mannWhitney(trials: DataFrame, metric: Column, variant: Column,
                  value: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byValue = trials.select(metric.as("m"), variant.as("g"),
        value.cast("long").as("v"))
      .groupBy("m", "v")
      .agg(sum(when(col("g") === 1, 1L).otherwise(0L)).as("c1"),
        count(lit(1)).as("ct"))
    val cum = graft.CachePool.persist(
      byValue.repartitionByRange(col("m"), col("v"))
        .withColumn("__pid", spark_partition_id())
        .withColumn("__cum", sum("ct").over(
          Window.partitionBy("m", "__pid").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))))
    val offs = cum.groupBy("m", "__pid").agg(sum("ct").as("__tot"))
      .withColumn("__off", coalesce(sum("__tot").over(
        Window.partitionBy("m").orderBy("__pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("m", "__pid", "__off")
    cum.join(offs, Seq("m", "__pid"))
      // doubled midrank of this tie group: 2·start + ct − 1, where
      // start = cum + off − ct + 1 (1-based first rank of the group)
      .withColumn("mr2", (col("__cum") + col("__off") - col("ct")) * 2
        + col("ct") + 1)
      .groupBy(col("m").as("metric"))
      .agg(sum(when(col("c1") > 0, col("c1") * col("mr2")).otherwise(0L))
          .as("r1_2"),
        sum("c1").as("n1"), sum(col("ct") - col("c1")).as("n2"))
      .withColumn("u2", col("r1_2") - col("n1") * (col("n1") + 1))
      .select(col("metric"), col("n1"), col("n2"), col("u2"),
        expr("""CAST(CASE WHEN u2 > n1 * n2 THEN 1
                |WHEN u2 < n1 * n2 THEN -1 ELSE 0 END AS INT)""".stripMargin)
          .as("direction"),
        expr(
          """CAST(n1 AS DECIMAL(38,0)) * CAST(n2 AS DECIMAL(38,0)) > 0 AND
            |CAST(3000000 AS DECIMAL(38,0)) *
            |  CAST(u2 - n1 * n2 AS DECIMAL(38,0)) *
            |  CAST(u2 - n1 * n2 AS DECIMAL(38,0))
            |>= CAST(3841459 AS DECIMAL(38,0)) * CAST(n1 AS DECIMAL(38,0)) *
            |   CAST(n2 AS DECIMAL(38,0)) * CAST(n1 + n2 + 1 AS DECIMAL(38,0))""".stripMargin)
          .as("significant"))
      .orderBy("metric")
  }

  /** k-category UNIFORMITY chi-square — the seasonality/skew test ("is
    * this metric flat across days-of-week / shards / buckets"): over a
    * per-(metric, category, count) frame, χ² against the uniform
    * expectation N/k is Σ (k·o − N)²/(k·N), computed in exact micro
    * fixed point (squares in DECIMAL(38,0); oracles replay over
    * HUGEINT). Categories absent from the frame contribute their
    * zero-count term floor(N·10⁶/k) — the grid need not be dense.
    * `criticalMicro` is the rejection threshold ·10⁶ for the caller's
    * df = k−1 (e.g. 12 592 000 for df 6 at α = 0.05).
    *
    * Each metric also reports its peak category (ties to the smallest),
    * via an order-free max over packed (count, category) — categories
    * must be integers in [0, 1023].
    *
    * Scale design: the input frame is already aggregated (callers
    * produce it with one map-side-combinable pass); everything here
    * runs on metric×category rows.
    */
  def uniformity(counts: DataFrame, metric: Column, cat: Column,
                 cnt: Column, kCats: Int, criticalMicro: Long): DataFrame = {
    require(kCats >= 2 && kCats <= 1024, s"kCats out of range: $kCats")
    // the df contract: a category outside [0, kCats) would inflate
    // k_present past kCats and silently corrupt the missing-cell
    // correction (and past 1023 also bleed into the packed-argmax count
    // bits), so violations fail loudly at the tighter bound
    val base = counts
      .select(metric.as("metric"), cat.cast("long").as("__cat"),
        cnt.cast("long").as("c"))
      .select(col("metric"), expr(
        s"""CASE WHEN __cat BETWEEN 0 AND ${kCats - 1} THEN __cat
           |ELSE raise_error(CONCAT('uniformity: category out of [0,${kCats - 1}]: ',
           |  CAST(__cat AS STRING))) END""".stripMargin).as("cat"),
        col("c"))
    val tot = base.groupBy("metric")
      .agg(sum("c").as("n"), count(lit(1)).as("k_present"))
    base.join(tot, Seq("metric"))
      .withColumn("term_micro", expr(
        s"""CAST($kCats * c - n AS DECIMAL(38,0)) *
           |CAST($kCats * c - n AS DECIMAL(38,0)) * 1000000
           |div (CAST($kCats AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)))""".stripMargin))
      .withColumn("pack", expr("c * 1024 + (1023 - cat)"))
      .groupBy("metric")
      .agg(max("n").as("n"), max("k_present").as("kp"),
        sum("term_micro").as("present_micro"), max("pack").as("pk"))
      .select(col("metric"), col("n"), lit(kCats.toLong).as("k"),
        (col("present_micro") +
          (lit(kCats.toLong) - col("kp")) *
            expr(s"n * 1000000 div $kCats")).as("chi2_micro"),
        expr("CAST(1023 - pk % 1024 AS INT)").as("peak_cat"),
        expr("pk div 1024").as("peak_count"))
      .withColumn("uniform_rejected", col("chi2_micro") >= criticalMicro)
      .select("metric", "n", "k", "chi2_micro", "uniform_rejected",
        "peak_cat", "peak_count")
      .orderBy("metric")
  }
}
