package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handles most skew by splitting oversized shuffle
  * partitions, but it cannot split a SINGLE key whose rows exceed one
  * partition (a "the" bucket in an LSH band join, a null-ish default key,
  * a celebrity user). Salting does: the skewed (large) side gets a random
  * salt in [0, salts), the small side is replicated `salts` times, and the
  * join key becomes (key, salt) — one hot key fans out over `salts` tasks.
  *
  * Use when a key's row count × row size exceeds a healthy shuffle
  * partition (hundreds of MB); prefer plain AQE otherwise — salting
  * multiplies the small side by `salts`.
  */
object SkewJoin {

  /** Inner equi-join of `large` and `small` on `key`, salted `salts` ways.
    *
    * The salt is `rand(seed)`-derived: seeded per partition + row
    * position, so it is stable under task retries (same input split ⇒
    * same sequence) yet spreads BYTE-IDENTICAL rows across salts — a
    * content hash would send every copy of a duplicated hot row to the
    * same salt, leaving the hot partition exactly as hot while still
    * paying the small-side replication. Any salt value joins correctly
    * (the small side is replicated at every salt), so the assignment
    * only needs balance, not content-determinism.
    */
  def saltedInnerJoin(large: DataFrame, small: DataFrame, key: String,
                      salts: Int = 16, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val saltedLarge = large.withColumn("__salt",
      floor(rand(seed) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Top-N heaviest keys of a column — the diagnostic used to decide
    * whether salting is needed at all. One partial-agg shuffle.
    */
  def keyHistogram(df: DataFrame, key: Column, topN: Int = 20): DataFrame =
    df.groupBy(key.as("key"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("key"))
      .limit(topN)
}
