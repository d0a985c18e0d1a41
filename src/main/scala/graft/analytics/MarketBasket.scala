package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Market-basket ASSOCIATION RULES — the classic co-occurrence miner
  * (support / confidence / lift), built the apriori way: items below the
  * support floor are pruned BEFORE any pair is generated, so pair volume
  * is bounded by frequent-item basket sizes, never the raw catalog.
  *
  * Thresholds are relative (ppm of the basket count) and evaluated by
  * cross-multiplied integer comparison; confidence is floor-division
  * ppm; lift is floor(n_ab·N·10⁶ / (n_a·n_b)) computed over
  * DECIMAL(38,0) (HUGEINT in the oracle) so the product is exact at any
  * realistic N — both engines replay every cell.
  *
  * Scale design: one distinct-pass over (basket, item), one item-support
  * aggregate (item-count sized), a broadcast semi-join of the frequent
  * set, per-basket pair generation bounded by `maxBasketItems`
  * (in-basket arrays never shuffle — pairs are generated post-collect_set
  * inside the basket row and aggregate map-side), and item-count-sized
  * broadcast joins for the rule metrics. No corpus self-join anywhere.
  */
object MarketBasket {

  /** @param baskets        row-level (basket, item) observations (dupes ok)
    * @param basket         basket key column
    * @param item           item column
    * @param minItemSupPpm  frequent-item floor, ppm of basket count
    * @param minPairSupPpm  rule-support floor, ppm of basket count
    * @param maxBasketItems baskets with more frequent items than this are
    *                       dropped (bounds the per-basket quadratic pair
    *                       fan-out; oversize baskets are catalog noise in
    *                       practice — count dropped baskets upstream if
    *                       they matter)
    */
  def rules(baskets: DataFrame, basket: Column, item: Column,
            minItemSupPpm: Long, minPairSupPpm: Long,
            maxBasketItems: Int = 64): DataFrame = {
    val bi = baskets.select(basket.as("bk"), item.as("it")).distinct()
    val nB = bi.agg(countDistinct(col("bk")).as("n_baskets"))
    val sup = bi.groupBy("it").agg(count(lit(1)).as("n_it"))
    val freq = sup.join(broadcast(nB),
        col("n_it") * 1000000L >= lit(minItemSupPpm) * col("n_baskets"))
      .select("it", "n_it")
    val fbi = bi.join(broadcast(freq.select("it")), Seq("it"))
    // in-basket pair generation: items sorted, (i, j>i) pairs via nested
    // array transforms — no explode before the basket is reduced to a row
    // persisted: the self-union below consumes the pair frame twice, and
    // without the persist the whole basket scan + pair fan-out reruns
    // per direction (caller releases via CachePool, as elsewhere)
    val pairs = graft.CachePool.persist(fbi.groupBy("bk")
      .agg(sort_array(collect_set(col("it"))).as("xs"))
      .filter(size(col("xs")) <= maxBasketItems)
      .select(explode(expr(
        """flatten(transform(xs, (x, i) ->
          |  transform(slice(xs, i + 2, size(xs)), y ->
          |    struct(x AS a, y AS b))))""".stripMargin)).as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("n_ab"))
      .join(broadcast(nB),
        col("n_ab") * 1000000L >= lit(minPairSupPpm) * col("n_baskets")))
    // both rule directions; antecedent/consequent supports via broadcast
    val directed = pairs.select(col("a").as("antecedent"),
        col("b").as("consequent"), col("n_ab"), col("n_baskets"))
      .union(pairs.select(col("b"), col("a"), col("n_ab"), col("n_baskets")))
    directed
      .join(broadcast(freq.select(col("it").as("antecedent"),
        col("n_it").as("n_ante"))), Seq("antecedent"))
      .join(broadcast(freq.select(col("it").as("consequent"),
        col("n_it").as("n_cons"))), Seq("consequent"))
      .withColumn("conf_ppm", expr("n_ab * 1000000 div n_ante"))
      .withColumn("lift_ppm", expr(
        """CAST(n_ab AS DECIMAL(38,0)) * CAST(n_baskets AS DECIMAL(38,0)) *
          |  CAST(1000000 AS DECIMAL(38,0))
          |div (CAST(n_ante AS DECIMAL(38,0)) * CAST(n_cons AS DECIMAL(38,0)))""".stripMargin))
      .select("antecedent", "consequent", "n_ab", "n_ante", "n_cons",
        "conf_ppm", "lift_ppm")
      .orderBy("antecedent", "consequent")
  }
}
