package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-resolution spatial binning — the geohash/H3-style aggregation
  * shape over (lat, lon) points: integer cell ids at power-of-two
  * resolutions, counts + exact fixed-point value sums per cell, EVERY
  * requested resolution in ONE scan (explode over the bounded
  * resolution list before the single partial-aggregated exchange — the
  * rollup/Expand discipline, never one pass per zoom level).
  *
  * Cell ids are pure arithmetic — `floor((lon+180)·2^r/360)` and the
  * latitude twin — one IEEE multiply-divide chain identical on any
  * engine, so the whole frame hash-replays externally; cells at
  * resolution r+1 nest exactly 4-in-1 inside r (the map-tile pyramid
  * invariant).
  */
object SpatialBins {

  /** The cell-id arithmetic, exposed for compositions (per-tile top-k
    * etc.): floor((coord + offset) · 2^res / span) — one IEEE
    * multiply-divide chain, bit-replayable on any engine. `res` may be a
    * literal or a column.
    */
  def cellY(lat: Column, res: Column): Column =
    floor((lat + 90.0) * pow(lit(2.0), res) / 180.0).cast("long")
  def cellX(lon: Column, res: Column): Column =
    floor((lon + 180.0) * pow(lit(2.0), res) / 360.0).cast("long")

  /** (res, cell_y, cell_x, n, sum_value_mu) for every non-empty cell at
    * every resolution in `resolutions`, ordered.
    */
  def binCounts(df: DataFrame, lat: Column, lon: Column, value: Column,
                resolutions: Seq[Int]): DataFrame = {
    require(resolutions.nonEmpty && resolutions.forall(r => r >= 0 && r <= 30),
      s"bad resolutions $resolutions")
    df.select(lat.as("__lat"), lon.as("__lon"),
        Relational.micros(value).as("__v_mu"),
        explode(typedlit(resolutions)).as("res"))
      .select(col("res"),
        cellY(col("__lat"), col("res")).as("cell_y"),
        cellX(col("__lon"), col("res")).as("cell_x"),
        col("__v_mu"))
      .groupBy("res", "cell_y", "cell_x")
      .agg(count(lit(1)).as("n"), sum(col("__v_mu")).as("sum_value_mu"))
      .orderBy("res", "cell_y", "cell_x")
  }
}
