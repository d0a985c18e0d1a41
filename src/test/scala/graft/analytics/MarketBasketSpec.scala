package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("support, confidence and lift on a hand-built basket set") {
    // 10 baskets: x in 8, y in 6, {x,y} in 5, z in 1 (infrequent), dup rows
    val rows =
      (1 to 5).flatMap(b => Seq(b -> "x", b -> "y", b -> "x")) ++ // {x,y} x5
        (6 to 8).map(b => b -> "x") ++
        Seq(9 -> "y", 10 -> "z")
    val df = rows.toDF("bk", "it")
    val out = MarketBasket.rules(df, col("bk"), col("it"),
      minItemSupPpm = 200000L, minPairSupPpm = 100000L).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6))).toMap
    // z (support 1/10 < 20%) pruned before pairing; x->y and y->x kept
    // conf(x->y) = 5e6 div 8 = 625000; conf(y->x) = 5e6 div 6 = 833333
    // lift = 5*10*1e6 div (8*6) = 1041666 both ways
    assert(out(("x", "y")) === ((5L, 8L, 6L, 625000L, 1041666L)))
    assert(out(("y", "x")) === ((5L, 6L, 8L, 833333L, 1041666L)))
    assert(out.size === 2)
  }

  test("pair-support floor prunes weak pairs") {
    // x,y frequent but co-occur once out of 10 baskets: 10% < 50% floor
    val rows = (1 to 5).map(b => b -> "x") ++ (5 to 9).map(b => b -> "y")
    val out = MarketBasket.rules(rows.toDF("bk", "it"), col("bk"), col("it"),
      minItemSupPpm = 200000L, minPairSupPpm = 500000L).collect()
    assert(out.isEmpty)
  }

  test("oversize baskets are dropped before pair generation") {
    // one 3-item basket over a cap of 2 contributes no pairs
    val rows = Seq(1 -> "a", 1 -> "b", 1 -> "c", 2 -> "a", 2 -> "b")
    val out = MarketBasket.rules(rows.toDF("bk", "it"), col("bk"), col("it"),
      minItemSupPpm = 1L, minPairSupPpm = 1L, maxBasketItems = 2).collect()
    // only basket 2's (a,b) pair survives
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ===
      Set(("a", "b"), ("b", "a")))
    assert(out.forall(_.getLong(2) === 1L))
  }

  test("brand rules on the orders corpus: both prune branches real") {
    val li = table("lineitem").select("l_orderkey", "l_partkey")
    val withBrand = li.join(broadcast(table("part").select("p_partkey", "p_brand")),
      col("l_partkey") === col("p_partkey"))
    val out = MarketBasket.rules(withBrand, col("l_orderkey"), col("p_brand"),
      minItemSupPpm = 140000L, minPairSupPpm = 20000L).collect()
    assert(out.nonEmpty)
    // directed rules come in mirrored pairs with equal lift
    val byPair = out.groupBy(r => Set(r.getString(0), r.getString(1)))
    assert(byPair.values.forall(_.length == 2))
    // confidence never exceeds 1e6; antecedent support >= pair support
    assert(out.forall(r => r.getLong(5) <= 1000000L && r.getLong(3) >= r.getLong(2)))
  }
}
