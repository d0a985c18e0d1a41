package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShardingSpec extends SparkSpec {
  import spark.implicits._

  private def assign(keys: Seq[Long], n: Int): Map[Long, Int] =
    keys.toDF("k")
      .select(col("k"), Sharding.rendezvousShard(col("k"), n).as("s"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("assignments are in range and deterministic") {
    val keys = (0L until 1000L)
    val a = assign(keys, 16)
    assert(a.values.forall(s => s >= 0 && s < 16))
    assert(assign(keys, 16) === a)
  }

  test("minimal movement: growing 16 -> 17 only moves keys to shard 16") {
    val keys = (0L until 2000L)
    val a16 = assign(keys, 16)
    val a17 = assign(keys, 17)
    val moved = keys.filter(k => a16(k) != a17(k))
    assert(moved.forall(k => a17(k) == 16))
    // movement fraction near 1/17 (between 2% and 12% on 2000 keys)
    assert(moved.size > 40 && moved.size < 240, s"moved ${moved.size}")
  }

  test("loads are near-balanced, every shard populated") {
    val a = assign(0L until 3400L, 17)
    val loads = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(loads.size === 17)
    // mean 200/shard; a fair hash keeps every shard within ~3 sigma
    assert(loads.values.min > 120 && loads.values.max < 290,
      s"loads $loads")
  }

  test("weight arithmetic never leaves BIGINT range (max operands)") {
    val w = Seq(Long.MaxValue, 0L, 2147483647L).toDF("k")
      .select(Sharding.weight(col("k"), lit(4095)).as("w")).collect()
    assert(w.forall(r => r.getLong(0) >= 0L && r.getLong(0) < 4294967296L))
  }
}
