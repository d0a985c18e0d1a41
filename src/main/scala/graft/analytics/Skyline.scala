package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2-D Pareto frontier (SKYLINE) — rows no other row dominates, where
  * domination = both dimensions ≤ and at least one strictly < (both
  * dimensions minimized; duplicates of a frontier point all survive).
  * The classic "best price/size trade-offs" operator.
  *
  * Distributed exactly in two phases, no global sort window and no pair
  * join:
  *   1. BUCKET PRUNE — x quantizes into `buckets` integer ranges off a
  *      broadcast (min, max) stats row; a `buckets`-row frame holds each
  *      bucket's min y and its running min over strictly-lower buckets
  *      (`lowmin` — the only unpartitioned window, `buckets` rows by
  *      construction). A row survives iff y < lowmin: any cross-bucket
  *      dominator sits in a lower bucket, so its y ≥ that bucket's min ≥
  *      lowmin > y — contradiction. Survivors ≈ skyline + same-bucket
  *      stragglers.
  *   2. EXACT within-bucket — same-bucket dominators of a survivor are
  *      provably survivors themselves (their y is even smaller), so two
  *      bucket-keyed windows finish the job exactly: min y over
  *      strictly-lower x (RANGE … 1 PRECEDING) and min y at equal x.
  *
  * All arithmetic is integer (callers pass integer-coded dimensions,
  * e.g. price cents); x's span times `buckets` must stay under 2⁶³.
  */
object Skyline {

  /** @return the skyline as (id, x, y), ordered by id. */
  def skyline2d(df: DataFrame, id: Column, x: Column, y: Column,
                buckets: Int = 64): DataFrame = {
    require(buckets >= 1, s"buckets must be positive: $buckets")
    val base = df.select(id.as("id"), x.cast("long").as("x"),
      y.cast("long").as("y"))
    val stats = base.agg(min("x").as("minx"), max("x").as("maxx"))
    // persisted: both the bucket-stats branch and the survivor filter
    // consume this frame; unpersisted, the scan + stats BNL would run
    // twice (caller releases via CachePool, as elsewhere)
    val bucketed = graft.CachePool.persist(base.crossJoin(broadcast(stats))
      .withColumn("bk", expr(s"(x - minx) * $buckets div (maxx - minx + 1)"))
      .select("id", "x", "y", "bk"))
    val bstats = bucketed.groupBy("bk").agg(min("y").as("bmin"))
    val lows = bstats.withColumn("lowmin", min("bmin").over(
        Window.orderBy("bk").rangeBetween(Window.unboundedPreceding, -1)))
      .select("bk", "lowmin")
    val survivors = bucketed.join(broadcast(lows), Seq("bk"))
      .filter(col("lowmin").isNull || col("y") < col("lowmin"))
    survivors
      .withColumn("prevmin", min("y").over(
        Window.partitionBy("bk").orderBy("x")
          .rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn("samemin", min("y").over(Window.partitionBy("bk", "x")))
      .filter((col("prevmin").isNull || col("prevmin") > col("y")) &&
        col("samemin") === col("y"))
      .select("id", "x", "y")
      .orderBy("id")
  }
}
