package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational analytics over the star schema: pricing summary, dimension
  * enrichment, join+agg top-N, per-key rollups.
  *
  * Float discipline (SURVEY.md §4): money aggregates sum
  * `floor(expr * 1e6)` longs ("micros") — bit-deterministic in any engine
  * and order-independent — instead of summing IEEE doubles, whose result
  * depends on partition merge order. Averages divide two exact numbers.
  */
object Relational {

  /** Exact fixed-point projection of a double expression (6 dp). The
    * double multiply is a single IEEE op — identical bits everywhere.
    */
  def micros(c: Column): Column = floor(c * 1e6).cast("long")

  /** Epoch microseconds of an event-time column, tolerant of BOTH
    * `TIMESTAMP` and `TIMESTAMP_NTZ` inputs: parquet written with
    * `isAdjustedToUTC=false` surfaces as NTZ, which bare `unix_micros`
    * rejects at analysis. The cast is a no-op on TIMESTAMP and
    * reinterprets NTZ wall-clock in the session zone (pinned UTC by every
    * graft session builder), so both encodings yield the same integers.
    */
  def epochMicros(c: Column): Column =
    unix_micros(c.cast(org.apache.spark.sql.types.TimestampType))

  /** TPC-H-q1-style grouped pricing summary over lineitem, exact.
    * Plans as partial agg → 2-key shuffle → final agg; the shipdate filter
    * is pushed to the parquet scan.
    */
  def pricingSummary(lineitem: DataFrame, cutoff: String = "1998-09-02"): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit(cutoff).cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(micros(col("l_extendedprice"))).as("sum_base_price_mu"),
        sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")))).as("sum_disc_price_mu"),
        sum(micros(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))))
          .as("sum_charge_mu"),
        sum(micros(col("l_discount"))).as("sum_disc_mu"),
        count(lit(1)).as("count_order"))
      .withColumn("avg_qty", col("sum_qty").cast("double") / col("count_order"))
      .withColumn("avg_price_mu", col("sum_base_price_mu").cast("double") / col("count_order"))
      .withColumn("avg_disc_mu", col("sum_disc_mu").cast("double") / col("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** Multiway dimension enrichment: customer ⋈ nation ⋈ region. The dims
    * are broadcast (they are tiny at every TPC-H scale) so the fact table
    * never shuffles — the whole join runs map-side in one stage.
    */
  def enrichCustomers(customer: DataFrame, nation: DataFrame, region: DataFrame): DataFrame =
    customer
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("n_name").as("nation"), col("r_name").as("region"))
      .orderBy("c_custkey")

  /** Revenue top-N customers: orders ⋈ lineitem (shuffle join on orderkey,
    * both sides large) → agg by custkey → broadcast-enrich with customer →
    * TakeOrderedAndProject. Revenue in exact micros.
    */
  def revenueTopN(orders: DataFrame, lineitem: DataFrame, customer: DataFrame, n: Int): DataFrame = {
    val revenue = lineitem
      .select(col("l_orderkey"),
        micros(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev_mu"))
      .join(orders.select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum("rev_mu").as("revenue_mu"), countDistinct("o_orderkey").as("n_orders"))
    revenue
      .join(broadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue_mu"), col("n_orders"))
      .orderBy(col("revenue_mu").desc, col("c_custkey"))
      .limit(n)
  }

  /** Referential-integrity audit over the star schema — the dbt-test
    * surface as ONE frame of violation counts: orphan facts (lineitem
    * rows whose order vanished), childless orders, customers who never
    * ordered, orders pointing at missing customers, parts never shipped.
    * Each check is a LEFT ANTI equi-join (the probe side streams; the
    * build side is the DISTINCT key projection, which Catalyst
    * broadcasts when small and shuffle-hashes otherwise) folded straight
    * into a count — no violation rows materialize unless asked.
    */
  def integrityAudit(orders: DataFrame, lineitem: DataFrame,
                     customer: DataFrame, part: DataFrame): DataFrame = {
    def violations(name: String, probe: DataFrame, probeKey: String,
                   keys: DataFrame, key: String): DataFrame =
      probe.join(keys, probe(probeKey) === keys(key), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
        .select(lit(name).as("check_name"), col("n_violations"))
    Seq(
      violations("childless_orders", orders, "o_orderkey",
        lineitem.select("l_orderkey").distinct(), "l_orderkey"),
      violations("customers_no_orders", customer, "c_custkey",
        orders.select("o_custkey").distinct(), "o_custkey"),
      violations("orders_bad_customer", orders, "o_custkey",
        customer.select("c_custkey"), "c_custkey"),
      violations("orphan_lineitems", lineitem, "l_orderkey",
        orders.select("o_orderkey"), "o_orderkey"),
      violations("parts_never_ordered", part, "p_partkey",
        lineitem.select("l_partkey").distinct(), "l_partkey")
    ).reduce(_ unionByName _).orderBy("check_name")
  }

  /** Per-key sliding-frame aggregate (ROWS BETWEEN n PRECEDING AND
    * CURRENT ROW) — the moving-average/moving-sum shape none of the
    * grouped aggregates cover: each supplier's shipment history ordered
    * by (shipdate, orderkey, linenumber) (a total order — (orderkey,
    * linenumber) is unique), with the trailing-`frame`-row quantity sum
    * and the previous row's quantity beside each row.
    *
    * Scale: the window is PARTITIONED BY the key — one hash shuffle on
    * suppkey, per-partition sort, single forward pass with an O(frame)
    * running buffer. No global window, no self-join (the naive
    * range-join formulation of a moving sum), and the frame sum is over
    * exact BIGINT quantities so any engine with ANSI window frames
    * replays it bit-for-bit.
    */
  def movingSum(lineitem: DataFrame, frame: Int = 6): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    lineitem
      .select(col("l_suppkey"), col("l_shipdate"), col("l_orderkey"),
        col("l_linenumber"), col("l_quantity").cast("long").as("qty"))
      .withColumn("mov_qty",
        sum(col("qty")).over(w.rowsBetween(-frame, 0)))
      .withColumn("prev_qty", lag(col("qty"), 1).over(w))
      .withColumn("rn", row_number().over(w).cast("long"))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("rn"), col("qty"), col("mov_qty"), col("prev_qty"))
      .orderBy("l_suppkey", "rn")
  }

  /** Per-user event rollup: counts, distinct types, exact value sum. */
  def eventRollup(events: DataFrame): DataFrame =
    events
      .groupBy("user_id")
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("event_type")).as("n_types"),
        sum(micros(col("value"))).as("sum_value_mu"),
        max(col("ts")).as("last_ts"))
      .orderBy("user_id")

  /** DISCOUNT LIFT — the price-response curve: line items bucketed by
    * integer discount percent, each bucket carrying trials, exact
    * quantity sums (cents) and the floor-division mean quantity (ppm of
    * a unit), plus the EXACT cross-multiplied lift sign vs the
    * zero-discount bucket (sign(sum_b·n₀ − sum₀·n_b) — no float means
    * compared). The bucket frame also carries a Kendall-style
    * concordance certificate: among all bucket pairs (i < j), how many
    * have strictly increasing vs decreasing mean quantity (again
    * cross-multiplied) — the "does quantity actually respond to
    * discount" monotonicity headline.
    *
    * Scale design: ONE hash aggregate to the ≤101-bucket frame; the
    * pair concordance is a self-join of that tiny frame. Nothing else
    * touches the corpus.
    */
  def discountLift(lineitem: DataFrame, discount: Column,
                   quantity: Column): DataFrame = {
    val base = lineitem.select(discount.as("disc"), quantity.as("qty"))
    // cross-multiplied mean comparisons run in DECIMAL(38,0) (HUGEINT in
    // oracles) so sum·n products stay exact at any bucket size
    val cmp = (sa: String, na: String, sb: String, nb: String) =>
      s"""CAST($sa AS DECIMAL(38,0)) * CAST($nb AS DECIMAL(38,0))
         |  < CAST($sb AS DECIMAL(38,0)) * CAST($na AS DECIMAL(38,0))""".stripMargin
    // persisted: three consumers (zero-bucket filter, pair self-join,
    // final projection) would each re-scan and re-aggregate the corpus
    val buckets = graft.CachePool.persist(base
      .groupBy(expr("CAST(round(disc * 100) AS INT)").as("disc_pct"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(qty * 100) AS BIGINT)")).as("sum_qty_c")))
    // always exactly one row (nulls when no zero-discount bucket
    // exists) — a filtered frame would be EMPTY then, and the
    // cross join would annihilate the whole curve
    val zero = buckets.agg(
      max(when(col("disc_pct") === 0, col("n"))).as("n0"),
      max(when(col("disc_pct") === 0, col("sum_qty_c"))).as("s0"))
    val pairs = buckets.select(col("disc_pct").as("pa"), col("n").as("na"),
        col("sum_qty_c").as("sa"))
      .crossJoin(buckets.select(col("disc_pct").as("pb"), col("n").as("nb"),
        col("sum_qty_c").as("sb")))
      .filter(col("pa") < col("pb"))
      .agg(
        sum(when(expr(cmp("sa", "na", "sb", "nb")), 1L).otherwise(0L))
          .as("concordant"),
        sum(when(expr(cmp("sb", "nb", "sa", "na")), 1L).otherwise(0L))
          .as("discordant"))
    buckets.crossJoin(broadcast(zero)).crossJoin(broadcast(pairs))
      .select(col("disc_pct"), col("n"), col("sum_qty_c"),
        expr("sum_qty_c * 10000 div n").as("avg_qty_ppm"),
        expr(s"""CAST(CASE WHEN n0 IS NULL THEN NULL
                 |     WHEN ${cmp("s0", "n0", "sum_qty_c", "n")} THEN 1
                 |     WHEN ${cmp("sum_qty_c", "n", "s0", "n0")} THEN -1
                 |     ELSE 0 END AS INT)""".stripMargin).as("lift_sign"),
        col("concordant"), col("discordant"))
      .orderBy("disc_pct")
  }

  /** JOIN PROFILE — the pre-flight diagnostic a planner (or an engineer
    * deciding whether a join needs salting) wants before running an
    * equi-join: exact per-side key cardinalities, key-overlap split
    * (keys only in A / only in B — the referential-health signal), the
    * EXACT join output size Σₖ aₖ·bₖ, the heaviest key and its share of
    * the output in ppm (the skew headline: one key at >10% share is a
    * salting candidate).
    *
    * Scale design: one hash aggregate per side to the KEY grain, a
    * key-keyed full outer join of the two count frames, then two passes
    * of plain aggregates over that key frame (second pass re-derives the
    * heaviest key against the broadcast 1-row max — deterministic ties
    * to the smallest key). Σ aₖ·bₖ accumulates in DECIMAL(38,0): a
    * skewed 100 TB join can exceed 2⁶³ output rows, and knowing that IS
    * the point of the profile.
    */
  def joinProfile(a: DataFrame, keyA: Column, b: DataFrame,
                  keyB: Column): DataFrame = {
    val ka = a.groupBy(keyA.cast("long").as("k")).agg(count(lit(1)).as("ca"))
    val kb = b.groupBy(keyB.cast("long").as("k")).agg(count(lit(1)).as("cb"))
    val j = ka.join(kb, Seq("k"), "full")
      .select(col("k"), coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .withColumn("prod", col("ca") * col("cb"))
    val agg = j.agg(
      sum(when(col("ca") > 0, 1L).otherwise(0L)).as("ndv_a"),
      sum(when(col("cb") > 0, 1L).otherwise(0L)).as("ndv_b"),
      sum(when(col("ca") > 0 && col("cb") > 0, 1L).otherwise(0L)).as("ndv_both"),
      sum(when(col("ca") > 0 && col("cb") === 0, 1L).otherwise(0L)).as("only_a"),
      sum(when(col("cb") > 0 && col("ca") === 0, 1L).otherwise(0L)).as("only_b"),
      sum(col("prod").cast("decimal(38,0)")).as("join_rows_dec"),
      max(col("prod")).as("max_key_rows"))
    val top = j.crossJoin(broadcast(agg.select("max_key_rows")))
      .filter(col("prod") === col("max_key_rows") && col("prod") > 0)
      .agg(min("k").as("top_key"))
    agg.crossJoin(broadcast(top))
      .select(col("ndv_a"), col("ndv_b"), col("ndv_both"), col("only_a"),
        col("only_b"),
        // the exact size survives in top_share_ppm's decimal arithmetic;
        // the BIGINT headline goes NULL (identically in the oracle)
        // when the true size exceeds 2^63 - a non-ANSI cast would
        // silently null here while the oracle's HUGEINT cast ERRORS,
        // so the guard keeps both engines aligned
        expr("""CASE WHEN join_rows_dec > CAST(9223372036854775807 AS DECIMAL(38,0))
                |THEN CAST(NULL AS BIGINT)
                |ELSE CAST(join_rows_dec AS BIGINT) END""".stripMargin)
          .as("join_rows"),
        col("max_key_rows"), col("top_key"),
        expr("CAST(max_key_rows AS DECIMAL(38,0)) * 1000000 div join_rows_dec")
          .as("top_share_ppm"))
  }
}
