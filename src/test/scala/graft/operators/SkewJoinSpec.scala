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
}
