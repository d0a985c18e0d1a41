package graft.analytics

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

import graft.SparkSpec

class RelationalSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("pricingSummary aggregates exact micros") {
    val li = Seq(
      ("A", "F", 10.0, 100.0, 0.1, 0.05, "1995-01-01"),
      ("A", "F", 20.0, 200.0, 0.2, 0.00, "1995-01-02"),
      ("R", "O", 5.0, 50.0, 0.0, 0.10, "1999-01-01") // past cutoff, excluded
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
        "l_discount", "l_tax", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp"))
    val r = Relational.pricingSummary(li).collect()
    assert(r.length === 1)
    val row = r(0)
    assert(row.getAs[Long]("sum_qty") === 30L)
    assert(row.getAs[Long]("sum_base_price_mu") === 300000000L)
    // 100*0.9 + 200*0.8 = 250 → 250_000_000 micros
    assert(row.getAs[Long]("sum_disc_price_mu") === 249999999L || row.getAs[Long]("sum_disc_price_mu") === 250000000L)
    assert(row.getAs[Long]("count_order") === 2L)
    assert(row.getAs[Double]("avg_qty") === 15.0)
  }

  test("enrichCustomers broadcasts both dims (no shuffle of the fact)") {
    val df = Relational.enrichCustomers(table("customer"), table("nation"), table("region"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.size === 2)
    val shuffles = collect(plan) { case s: ShuffleExchangeExec => s }
    // only the final orderBy range-partitions; the joins must not shuffle
    assert(shuffles.size <= 1, s"unexpected shuffles: $shuffles")
  }

  test("revenueTopN matches a hand-rolled computation") {
    val got = Relational.revenueTopN(table("orders"), table("lineitem"), table("customer"), 5)
    val expected = table("lineitem")
      .join(table("orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 1e6).cast("long")).as("rev"))
      .orderBy(col("rev").desc, col("o_custkey"))
      .limit(5)
      .select(col("o_custkey"), col("rev")).as[(Long, Long)].collect().toSeq
    assert(got.select(col("c_custkey"), col("revenue_mu")).as[(Long, Long)].collect().toSeq === expected)
  }

  test("centralStatsApprox tracks the exact median closely") {
    val df = table("orders").select(col("o_totalprice"))
    val exact = Stats.centralStats(df, col("o_totalprice")).head()
    val approx = Stats.centralStatsApprox(df, col("o_totalprice")).head()
    assert(approx.getAs[Double]("avg_v") === exact.getAs[Double]("avg_v"))
    val err = math.abs(approx.getAs[Double]("median_v") - exact.getAs[Double]("median_v"))
    assert(err / math.max(1.0, exact.getAs[Double]("median_v")) < 0.01)
  }

  test("groupQuantilesSketch certifies sketch ranks against the exact data") {
    // real table: every certificate must hold at the default accuracy
    val li = table("lineitem")
    val got = Stats.groupQuantilesSketch(li, col("l_returnflag"), col("l_quantity"),
        Seq(0.25, 0.5, 0.75))
      .as[(String, Long, Long, Boolean)].collect()
    graft.CachePool.releaseAll()
    val nFlags = li.select("l_returnflag").distinct().count()
    assert(got.length === nFlags * 3)
    assert(got.forall(_._4), s"rank certificate failed: ${got.filterNot(_._4).mkString(",")}")
    // group sizes must be the real per-flag row counts
    val sizes = li.groupBy("l_returnflag").count().as[(String, Long)].collect().toMap
    assert(got.forall(r => sizes(r._1) === r._3))

    // hand fixture: accuracy high => sketch exact; a wrong "sketch" value
    // (simulated by an impossible quantile ask) would fail — here we
    // check the certificate bounds tolerate value ties (rank intervals).
    val tied = Seq.fill(50)(("g", 7.0)) ++ Seq.fill(50)(("g", 9.0))
    val certTied = Stats.groupQuantilesSketch(tied.toDF("k", "v"), col("k"), col("v"),
        Seq(0.25, 0.5, 0.75))
      .as[(String, Long, Long, Boolean)].collect()
    graft.CachePool.releaseAll()
    assert(certTied.forall(_._4))
  }

  test("movingSum: trailing frame sums and lag along each supplier's history") {
    val li = Seq(
      (1L, 10L, 1, 1.0, "1995-01-01"),
      (1L, 11L, 1, 2.0, "1995-01-02"),
      (1L, 12L, 1, 3.0, "1995-01-03"),
      (1L, 13L, 1, 4.0, "1995-01-04"),
      (2L, 14L, 1, 9.0, "1995-01-01")
    ).toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp"))
    val got = Relational.movingSum(li, frame = 2)
      .select("l_suppkey", "rn", "qty", "mov_qty", "prev_qty")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toList
    assert(got === List(
      (1L, 1L, 1L, 1L, None), (1L, 2L, 2L, 3L, Some(1L)),
      (1L, 3L, 3L, 6L, Some(2L)), (1L, 4L, 4L, 9L, Some(3L)),
      (2L, 1L, 9L, 9L, None)))
  }

  test("movingSum windows are all supplier-partitioned") {
    val li = Seq((1L, 10L, 1, 1.0, "1995-01-01"))
      .toDF("l_suppkey", "l_orderkey", "l_linenumber", "l_quantity", "d")
      .withColumn("l_shipdate", col("d").cast("timestamp"))
    val df = Relational.movingSum(li)
    df.collect()
    val windows = collectWithSubqueries(df.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty))
  }

  test("corrMoments: exact integer moments and the decimal sign certificate") {
    val df = Seq(
      ("A", 1.0, 2.0), ("A", 2.0, 4.0), ("A", 3.0, 7.0),   // positive corr
      ("B", 1.0, 9.0), ("B", 2.0, 5.0), ("B", 3.0, 1.0)    // negative corr
    ).toDF("k", "x", "y")
    val got = Stats.corrMoments(df, col("k"), col("x"), col("y"))
      .as[(String, Long, Long, Long, Long, Long, Long, Boolean)].collect().toList
    assert(got === List(
      ("A", 3L, 6L, 13L, 14L, 31L, 69L, true),
      ("B", 3L, 6L, 15L, 14L, 22L, 107L, false)))
    // the moments reproduce Pearson r exactly where it's defined
    val (_, n, sx, sy, sxx, sxy, syy, _) = got.head
    val r = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble * (n * syy - sy * sy).toDouble)
    val sparkR = df.filter(col("k") === "A").agg(corr(col("x"), col("y")))
      .as[Double].collect().head
    assert(math.abs(r - sparkR) < 1e-12)
  }

  test("winsorizedStats clips to the quartile cut points with exact integer sums") {
    // sorted group: [-50, 1..8, 100] — outliers on both tails.
    // percentile interp (0-indexed rank r = q·9): p25 → r=2.25 →
    // 2 + 0.25·1 = 2.25; p75 → r=6.75 → 6 + 0.75·1 = 6.75.
    val df = (Seq(100.0, -50.0) ++ (1 to 8).map(_.toDouble)).map(("A", _))
      .toDF("k", "v")
    val got = Stats.winsorizedStats(df, col("k"), col("v"))
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().head
    val (_, n, loQ4, hiQ4, nLo, nHi, sumQ4) = got
    assert(n === 10L)
    assert(loQ4 === 9L && hiQ4 === 27L)   // 2.25·4, 6.75·4
    assert(nLo === 3L && nHi === 3L)      // {-50,1,2} below, {7,8,100} above
    // clamped ×4: [9,9,9,12,16,20,24,27,27,27] — sum 180, mean 4.5
    assert(sumQ4 === 180L)
    // the winsorized mean sits at the data's center, unmoved by ±outliers
    assert(sumQ4.toDouble / (4 * n) === 4.5)
  }

  test("robustOutliers flags the MAD fence exactly, including the degenerate MAD=0 group") {
    // group a: [10,10,10,10,100] → med2=20, dev2=[0,0,0,0,180], mad4=0 —
    // the classic MAD degeneracy: any value off the median is an outlier
    // group b: 1..9 → med2=10, dev2 sorted [0,2,2,4,4,6,6,8,8] → mad4=8;
    // fence 2·dev2 > 24 flags nothing
    val df = (Seq.fill(4)(10L) ++ Seq(100L)).map(("a", _))
      .++((1L to 9L).map(("b", _))).toDF("k", "v")
    val got = Stats.robustOutliers(df, col("k"), col("v"), k = 3)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 5L, 20L, 0L, 1L), ("b", 9L, 10L, 8L, 0L)))
  }

  test("integrityAudit counts planted referential violations per check") {
    val orders = Seq((10L, 1L), (11L, 2L), (12L, 99L)).toDF("o_orderkey", "o_custkey")
    val lineitem = Seq((10L, 100L), (10L, 101L), (77L, 100L))
      .toDF("l_orderkey", "l_partkey")
    val customer = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("c_custkey", "c_name")
    val part = Seq((100L, "p"), (200L, "q")).toDF("p_partkey", "p_name")
    val got = Relational.integrityAudit(orders, lineitem, customer, part)
      .as[(String, Long)].collect().toList
    assert(got === List(
      ("childless_orders", 2L),      // 11, 12 have no lineitem
      ("customers_no_orders", 1L),   // customer 3
      ("orders_bad_customer", 1L),   // order 12 → custkey 99
      ("orphan_lineitems", 1L),      // orderkey 77
      ("parts_never_ordered", 1L)))  // part 200 never shipped
  }

  test("eventRollup counts and sums per user") {
    val ev = Seq(
      (1L, "view", 1.5, "2024-01-01 00:00:00"),
      (1L, "view", 2.5, "2024-01-01 01:00:00"),
      (2L, "click", -1.0, "2024-01-01 02:00:00")
    ).toDF("user_id", "event_type", "value", "t")
      .withColumn("ts", col("t").cast("timestamp"))
    val r = Relational.eventRollup(ev).collect()
    assert(r.map(x => (x.getAs[Long]("user_id"), x.getAs[Long]("n_events"),
      x.getAs[Long]("n_types"), x.getAs[Long]("sum_value_mu"))).toSeq ===
      Seq((1L, 2L, 1L, 4000000L), (2L, 1L, 1L, -1000000L)))
  }

}
