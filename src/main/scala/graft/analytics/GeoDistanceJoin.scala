package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Within-radius distance JOIN — the geospatial self-join the reference's
  * house frame implies (latitude/longitude columns,
  * /root/reference/dags/main.py:66-67,343) but its single-node pipeline
  * never attempts: all point pairs within `radiusKm`, found by grid-cell
  * BLOCKING + exact haversine refinement, never a cross join.
  *
  * Blocking grid: latitude bands of `cellLatDeg` degrees; per band, a
  * longitude cell width of `2·cellLatDeg / cos(bandCenter)` degrees — the
  * physical cell width is therefore ~2·cellLatDeg·111 km at EVERY
  * latitude (an equal-width ring grid, the same idea as S2/H3 cell
  * sizing), so the candidate fan-out is a CONSTANT 3×3 neighborhood per
  * point, pole to pole. Near the poles the band's ring degenerates to
  * n_b ≤ 3 cells and the 3-cell longitude explode covers the whole ring,
  * which is exactly the "polar cap" special case cell hierarchies handle.
  *
  * Join shape: one side explodes each point into the ≤9 (band, cell)
  * pairs whose cells can contain a within-radius partner (using the
  * TARGET band's own cell width — bands differ in width); the other side
  * keeps each point only in its HOME cell. Every within-radius pair is
  * then found EXACTLY once per orientation (covering sets are per-row
  * deduped), and the `idA < idB` predicate keeps one orientation — no
  * post-join distinct, no double counting. The join is an equi-join on
  * (band, cell): shuffle by cell id, never a cartesian product.
  *
  * Coverage proof sketch (kLat = kLon = 1): a within-r pair has
  * |Δlat| ≤ r/111.195 ≤ 0.9·cellLatDeg, so bands differ by ≤1. For
  * longitude, |Δlon| ≤ r/(111.195·cos(bandTop)) and the target band's
  * cell width is 2·cellLatDeg/cos(bandTop − cellLatDeg/2); the ratio is
  * ≤ 0.9/2 · cos(bandTop−½cell)/cos(bandTop) < 1 for every band whose
  * ring has >3 cells, and rings with ≤3 cells are covered entirely.
  * Everything is pure IEEE arithmetic + libm trig, so an external engine
  * replays the exact candidate set and refined pair set.
  */
object GeoDistanceJoin {

  /** Degrees→radians as one explicit multiply by the nearest-double π/180:
    * `radians()` implementations differ in evaluation order (x/180·π vs
    * x·(π/180)) by 1 ulp across engines; a shared literal constant makes
    * the conversion bit-identical everywhere.
    */
  private def deg2rad(c: Column): Column = c * 0.017453292519943295

  /** Mean-earth-radius haversine distance in km (R = 6371.0). Written as
    * one fixed expression tree (products, not pow) so external replays
    * are bit-comparable.
    */
  def haversineKm(latA: Column, lonA: Column, latB: Column, lonB: Column): Column = {
    val sLat = sin(deg2rad(latB - latA) / 2.0)
    val sLon = sin(deg2rad(lonB - lonA) / 2.0)
    asin(sqrt(sLat * sLat + cos(deg2rad(latA)) * cos(deg2rad(latB)) * (sLon * sLon))) * 2.0 * 6371.0
  }

  private def bandOf(lat: Column, cellLatDeg: Double, nBands: Long): Column =
    least(floor((lat + 90.0) / cellLatDeg).cast("long"), lit(nBands - 1))

  /** Per-band longitude cell width in degrees: 2·cellLatDeg at the
    * equator, widened by 1/cos(bandCenter) so the physical width is
    * constant; `band` is the target band (0-based from the south pole).
    */
  private def lonWidth(band: Column, cellLatDeg: Double): Column =
    lit(2.0 * cellLatDeg) / cos(deg2rad((band + 0.5) * cellLatDeg - 90.0))

  /** All ORDERED candidate pairs within `radiusKm` (both orientations,
    * self excluded): (id_a, id_b, dist_m, dist_km). The blocking +
    * refine core shared by [[withinRadiusPairs]] (which keeps one
    * orientation) and [[nearestNeighbors]] (which argmins per point).
    *
    * `radiusKm` must be ≤ 0.9·111.195·cellLatDeg (≈100 km at the default
    * 1° band) — the single-neighborhood coverage bound; a larger radius
    * needs a proportionally coarser grid, same plan.
    */
  def candidatePairs(points: DataFrame, id: Column, lat: Column, lon: Column,
                     radiusKm: Double, cellLatDeg: Double = 1.0): DataFrame = {
    require(cellLatDeg > 0 && 180.0 % cellLatDeg == 0.0, s"bad cell $cellLatDeg")
    require(radiusKm > 0 && radiusKm <= 0.9 * 111.195 * cellLatDeg,
      s"radius $radiusKm km exceeds the 1-neighborhood coverage bound of " +
        s"${0.9 * 111.195 * cellLatDeg} km at cellLatDeg=$cellLatDeg")
    val nBands = (180.0 / cellLatDeg).toLong
    val pts = points.select(id.as("pid"), lat.as("plat"), lon.as("plon"))

    // covering side: ≤9 (band, cell) entries per point, per-row deduped
    // (polar rings with ≤3 cells would otherwise repeat a cell id).
    val covering = pts
      .withColumn("band", explode(array_distinct(array((-1 to 1).map(db =>
        greatest(least(bandOf(col("plat"), cellLatDeg, nBands) + db,
          lit(nBands - 1)), lit(0L))): _*))))
      .withColumn("__w", lonWidth(col("band"), cellLatDeg))
      .withColumn("__n", ceil(lit(360.0) / col("__w")).cast("long"))
      .withColumn("cell", explode(array_distinct(array((-1 to 1).map(dc =>
        pmod(floor((col("plon") + 180.0) / col("__w")).cast("long") + dc,
          col("__n"))): _*))))
      .select(col("pid").as("id_a"), col("plat").as("lat_a"),
        col("plon").as("lon_a"), col("band"), col("cell"))

    // home side: each point exactly once, in its own band's cell.
    val home = pts
      .withColumn("band", bandOf(col("plat"), cellLatDeg, nBands))
      .withColumn("cell",
        floor((col("plon") + 180.0) / lonWidth(col("band"), cellLatDeg)).cast("long"))
      .select(col("pid").as("id_b"), col("plat").as("lat_b"),
        col("plon").as("lon_b"), col("band"), col("cell"))

    covering.join(home, Seq("band", "cell"))
      .filter(col("id_a") =!= col("id_b"))
      .withColumn("dist_km", haversineKm(col("lat_a"), col("lon_a"),
        col("lat_b"), col("lon_b")))
      .filter(col("dist_km") <= radiusKm)
      .select(col("id_a"), col("id_b"),
        floor(col("dist_km") * 1000.0).cast("long").as("dist_m"))
  }

  /** All unordered point pairs within `radiusKm`, as
    * (id_a, id_b, dist_m) with id_a < id_b, dist_m = floor(km·1000).
    */
  def withinRadiusPairs(points: DataFrame, id: Column, lat: Column, lon: Column,
                        radiusKm: Double, cellLatDeg: Double = 1.0): DataFrame =
    candidatePairs(points, id, lat, lon, radiusKm, cellLatDeg)
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "dist_m")
      .orderBy("id_a", "id_b")

  /** Per-point k nearest neighbors WITHIN `radiusKm` — the geo kNN join:
    * (src_id, neighbor_id, dist_m), the k closest partners of every
    * point that has any, ranked by (dist_m ASC, neighbor_id ASC). The
    * argmin runs through [[graft.plans.TopKPerKey]] bounded heaps — a
    * point inside a million-listing city block ships k rows per map
    * task, never a per-point window over the candidate set. Ranking on
    * the metre-floored integer distance (id tie-break) keeps the rank
    * replayable by an external engine. Points with no partner within the
    * radius emit nothing (inner-join semantics; left-join the originals
    * back for "isolated point" analyses).
    */
  def nearestNeighbors(points: DataFrame, id: Column, lat: Column, lon: Column,
                       radiusKm: Double, k: Int = 1,
                       cellLatDeg: Double = 1.0): DataFrame = {
    require(k > 0, s"bad k $k")
    graft.plans.TopKPerKey.topK(
        candidatePairs(points, id, lat, lon, radiusKm, cellLatDeg)
          .select(col("id_a").as("src_id"), col("id_b").as("neighbor_id"),
            col("dist_m")),
        Seq("src_id"), Seq(("dist_m", true), ("neighbor_id", true)), k)
      .select("src_id", "neighbor_id", "dist_m")
      .orderBy("src_id", "neighbor_id")
  }
}
