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

  /** Every unordered intra-key pair `(id_a < id_b)` with BOUNDED task sizes:
    * the salted form of the LSH-band self-join.
    *
    * A plain band-bucket self-join puts a bucket of m rows into one task and
    * forms m² pairs there — AQE's skew split cannot help because a single
    * join key is indivisible. This operator measures each key's row count
    * inline (one partial-agg shuffle over rows it was already shuffling) and
    * TILES hot keys: a key with m > hotThreshold rows is hashed into
    * S = ⌈m / hotThreshold⌉ groups, and each of the S·(S+1)/2 group-pair
    * cells (i ≤ j) becomes its own join key — per-task pair work drops to
    * ~(m/S)² while total pair work is unchanged. Cold keys (the vast
    * majority) take the ordinary self-join path; the two paths union.
    *
    * Each hot row is replicated S+1 times — negligible next to the m²
    * pair blowup it bounds. The caller's input should be cheap to re-derive
    * (e.g. a projection of an already-persisted signature frame): both
    * paths and the key-count aggregation scan it (five scans total).
    *
    * Output: (id_a, pay_a, id_b, pay_b), one row per key the pair shares.
    * Deterministic (group assignment is xxhash64(id) mod S).
    *
    * `maxKeyCount` is the OUTPUT-volume knob tiling cannot provide: a key
    * with m rows emits C(m,2) pairs no matter how the work is spread, so a
    * key hotter than `maxKeyCount` is EXCLUDED from pair enumeration
    * entirely (both paths). The excluded set is bounded — at most
    * totalRows / maxKeyCount keys — and comes from the same count
    * aggregate the tiling already runs, so the cutoff costs nothing.
    * Default Int.MaxValue = no exclusion (tiling only).
    */
  def boundedSelfPairs(df: DataFrame, keys: Seq[String], id: Column, payload: Column,
                       hotThreshold: Int = 4096, maxKeyCount: Int = Int.MaxValue): DataFrame = {
    require(hotThreshold > 1, "hotThreshold must exceed 1")
    require(maxKeyCount > 0, "maxKeyCount must be positive")
    val keyCols = keys.map(col)
    val base = df.select(keyCols :+ id.as("__sp_id") :+ payload.as("__sp_pay"): _*)
    // Hot keys come from a KEY-ONLY count aggregate (the shuffle carries
    // 8-byte keys, not payload rows) and are expected to be a tiny — often
    // empty — set, broadcast to filter both paths. The cold path is then
    // the plain self-join plus a broadcast anti-join: no extra shuffle, no
    // materialization beyond whatever the caller already persists. Keys
    // above maxKeyCount leave the cold path through the same anti-join and
    // never enter the hot (tiled) path.
    val counts = base.groupBy(keyCols: _*).agg(count(lit(1)).as("__sp_cnt"))
    val hotKeys = counts
      .filter(col("__sp_cnt") > hotThreshold && col("__sp_cnt") <= maxKeyCount)
    val notCold = counts
      .filter(col("__sp_cnt") > math.min(hotThreshold.toLong, maxKeyCount.toLong))

    val cold = base.join(broadcast(notCold.select(keyCols: _*)), keys, "left_anti")
    val coldPairs = cold
      .select(keyCols :+ col("__sp_id").as("id_a") :+ col("__sp_pay").as("pay_a"): _*)
      .join(cold.select(keyCols :+ col("__sp_id").as("id_b") :+ col("__sp_pay").as("pay_b"): _*), keys)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "pay_a", "id_b", "pay_b")

    // Triangle tiling: row in group g joins as the LOW side of cells (g, j≥g)
    // and the HIGH side of cells (i≤g, g). Pair {x,y} with groups g₁ ≤ g₂
    // appears exactly once at cell (g₁,g₂) — twice when g₁ = g₂ (both
    // orders), which the id_a < id_b filter collapses; for g₁ < g₂ the ids
    // arrive in arbitrary order, so the final select re-orients them.
    val hot = base.join(broadcast(hotKeys), keys)
      .withColumn("__sp_s", ceil(col("__sp_cnt").cast("double") / hotThreshold).cast("int"))
      .withColumn("__sp_g", pmod(xxhash64(col("__sp_id")), col("__sp_s")).cast("int"))
    val cellKeys = keys :+ "__c1" :+ "__c2"
    val hotA = hot.select(keyCols ++ Seq(col("__sp_g").as("__c1"),
      explode(sequence(col("__sp_g"), col("__sp_s") - 1)).as("__c2"),
      col("__sp_id").as("id_a"), col("__sp_pay").as("pay_a")): _*)
    val hotB = hot.select(keyCols ++ Seq(
      explode(sequence(lit(0), col("__sp_g"))).as("__c1"), col("__sp_g").as("__c2"),
      col("__sp_id").as("id_b"), col("__sp_pay").as("pay_b")): _*)
    val hotPairs = hotA.join(hotB, cellKeys)
      .filter(col("__c1") < col("__c2") || col("id_a") < col("id_b"))
      .select(
        when(col("id_a") < col("id_b"), struct(col("id_a").as("i"), col("pay_a").as("p")))
          .otherwise(struct(col("id_b").as("i"), col("pay_b").as("p"))).as("__lo"),
        when(col("id_a") < col("id_b"), struct(col("id_b").as("i"), col("pay_b").as("p")))
          .otherwise(struct(col("id_a").as("i"), col("pay_a").as("p"))).as("__hi"))
      .select(col("__lo.i").as("id_a"), col("__lo.p").as("pay_a"),
        col("__hi.i").as("id_b"), col("__hi.p").as("pay_b"))

    coldPairs.unionByName(hotPairs)
  }
}
