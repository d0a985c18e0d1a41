package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-level OLAP aggregation shapes the reference's flat groupBys
  * (dags/main.py:313-379) never reach: rollup hierarchies and pivoted
  * cross-tabs. Both are single-shuffle aggregates in Spark — `rollup`
  * expands each input row into its grouping-set combinations BEFORE the
  * exchange (one Expand + one partial-aggregated shuffle, map-side
  * combinable, never one pass per level), and `pivot` with an EXPLICIT
  * value list compiles to conditional aggregates in one pass (the
  * implicit-values form runs a distinct-collect first and caps at
  * `spark.sql.pivotMaxValues` — at 100 TB always pass the values).
  */
object Olap {

  /** Two-level rollup: exact doc counts and integer token sums per
    * (grp1, grp2), per grp1 subtotal, and grand total, disambiguated by
    * `gid` = grouping_id() (bit i set ⇔ level i rolled up — the same
    * encoding DuckDB's GROUPING() emits, which the oracle leans on).
    * Null group values from rolled-up levels are sentineled to `<all>`
    * so the output is total-ordered without null-ordering pitfalls.
    */
  def rollupStats(df: DataFrame, grp1: Column, grp2: Column,
                  tokens: Column): DataFrame =
    df.select(grp1.as("g1"), grp2.as("g2"), tokens.cast("long").as("tk"))
      .rollup(col("g1"), col("g2"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("tk")), lit(0L)).as("n_tokens"))
      .select(col("gid"),
        coalesce(col("g1"), lit("<all>")).as("g1"),
        coalesce(col("g2"), lit("<all>")).as("g2"),
        col("n_docs"), col("n_tokens"))
      .orderBy("gid", "g1", "g2")

  /** Cross-tab: one row per `grp`, one exact count column per pivot
    * value (explicit list — one conditional-aggregate pass, no
    * distinct-collect, no value-count cap). Missing combinations are 0,
    * not null, so the frame is dense and hash-stable.
    */
  def pivotCounts(df: DataFrame, grp: Column, pivotCol: Column,
                  values: Seq[String]): DataFrame = {
    df.select(grp.as("g"), pivotCol.as("p"))
      .groupBy("g").pivot("p", values).agg(count(lit(1)))
      .na.fill(0L, values)
      .orderBy("g")
  }

  /** Full CUBE over two dimensions — all four grouping sets
    * ((g1,g2), (g1), (g2), ()) in one pass, where [[rollupStats]]'s
    * hierarchy only descends one way. Same physical shape (one Expand
    * before ONE partial-aggregated exchange — 4 sets ⇒ 4× the map-side
    * rows, still never one scan per set) and the same grouping_id/
    * sentinel discipline, so the same DuckDB GROUPING() bitmask replays
    * it. The cross-dimension marginal ((g2) alone) is what CUBE adds
    * over ROLLUP — a per-language total across every source here.
    */
  def cubeStats(df: DataFrame, grp1: Column, grp2: Column,
                tokens: Column): DataFrame =
    df.select(grp1.as("g1"), grp2.as("g2"), tokens.cast("long").as("tk"))
      .cube(col("g1"), col("g2"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("tk")), lit(0L)).as("n_tokens"))
      .select(col("gid"),
        coalesce(col("g1"), lit("<all>")).as("g1"),
        coalesce(col("g2"), lit("<all>")).as("g2"),
        col("n_docs"), col("n_tokens"))
      .orderBy("gid", "g1", "g2")
}
