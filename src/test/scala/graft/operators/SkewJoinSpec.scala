package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("saltedInnerJoin returns exactly the plain join's rows") {
    // one hot key (90% of rows) + a long tail
    val large = spark.range(0, 10000).toDF("id")
      .withColumn("k", when(col("id") % 10 =!= 0, lit("hot")).otherwise(concat(lit("k"), col("id"))))
    val small = Seq(("hot", 1), ("k0", 2), ("k10", 3), ("absent", 4)).toDF("k", "v")

    val plain = large.join(small, Seq("k")).select("id", "v").as[(Long, Int)].collect().sorted.toSeq
    val salted = SkewJoin.saltedInnerJoin(large, small, "k", salts = 8)
      .select("id", "v").as[(Long, Int)].collect().sorted.toSeq
    assert(salted === plain)
    assert(plain.size === 9000 + 2)
  }

  test("saltedInnerJoin spreads even BYTE-IDENTICAL hot rows over all salt values") {
    // every row is identical — a content hash would collapse them onto
    // one salt; the positional salt must still spread them.
    val large = spark.range(0, 5000).toDF("id").select(lit("hot").as("k"))
    val small = Seq(("hot", 1)).toDF("k", "v")
    val saltCount = large
      .withColumn("__salt", floor(rand(42L) * 8).cast("int"))
      .select(countDistinct("__salt")).as[Long].head()
    assert(saltCount === 8L)
    assert(SkewJoin.saltedInnerJoin(large, small, "k", 8).count() === 5000L)
  }

  test("keyHistogram surfaces the heavy keys") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("k", when(col("id") < 900, lit("heavy")).otherwise(lit("light")))
    val top = SkewJoin.keyHistogram(df, col("k"), 1).as[(String, Long)].head()
    assert(top === (("heavy", 900L)))
  }

  test("boundedSelfPairs with a planted hot key equals the plain self-join, each pair exactly once") {
    // one hot key (200 rows → tiled at threshold 32 into ⌈200/32⌉ = 7
    // groups) plus cold keys that take the ordinary path.
    val df = spark.range(0, 200).select(lit("hot").as("k"), col("id"))
      .unionByName(spark.range(200, 260)
        .select(concat(lit("cold"), pmod(col("id"), lit(6))).as("k"), col("id")))
      .withColumn("pay", col("id") * 7)
    val got = SkewJoin.boundedSelfPairs(df, Seq("k"), col("id"), col("pay"), hotThreshold = 32)
      .select("id_a", "pay_a", "id_b", "pay_b")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // payloads must travel with their ids through the re-orientation.
    got.foreach { case (a, pa, b, pb) =>
      assert(pa === a * 7 && pb === b * 7 && a < b)
    }
    val rows = df.select("k", "id").as[(String, Long)].collect().toSeq
    val expected = (for {
      (k1, i1) <- rows; (k2, i2) <- rows
      if k1 == k2 && i1 < i2
    } yield (i1, i2)).toSet
    assert(got.map(p => (p._1, p._3)).toSet === expected)
    assert(got.size === expected.size, "each intra-key pair must appear exactly once")
  }

  test("boundedSelfPairs is identical whether or not the hot path engages") {
    val df = spark.range(0, 120)
      .select(pmod(col("id"), lit(3)).cast("string").as("k"), col("id"),
        (col("id") % 11).as("pay"))
    def run(thr: Int) =
      SkewJoin.boundedSelfPairs(df, Seq("k"), col("id"), col("pay"), hotThreshold = thr)
        .select("id_a", "id_b").as[(Long, Long)].collect().sorted.toSeq
    // threshold 1000: all cold. threshold 8: every key hot (40 rows each).
    assert(run(1000) === run(8))
  }
}
