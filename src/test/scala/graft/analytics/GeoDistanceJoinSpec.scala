package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GeoDistanceJoinSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(pts: Seq[(Long, Double, Double)], r: Double = 100.0) =
    GeoDistanceJoin.withinRadiusPairs(
      pts.toDF("id", "lat", "lon"), col("id"), col("lat"), col("lon"), r)

  test("finds a known-distance pair and excludes an out-of-radius one") {
    // 1° of latitude at fixed lon ≈ 111.19 km > 100 → excluded;
    // 0.5° ≈ 55.6 km → included.
    val got = pairs(Seq((1L, 10.0, 20.0), (2L, 10.5, 20.0), (3L, 11.5, 20.0)))
      .collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSet === Set((1L, 2L)))
    val distM = got.head.getLong(2)
    assert(distM > 55000 && distM < 56000, s"dist $distM")
  }

  test("pairs straddling the antimeridian are found via ring wrap") {
    val got = pairs(Seq((1L, 0.0, 179.9), (2L, 0.0, -179.9)))
      .collect()
    // Δlon 0.2° at the equator ≈ 22 km
    assert(got.length === 1)
    assert(got.head.getLong(2) > 21000 && got.head.getLong(2) < 23000)
  }

  test("polar-ring pairs with huge Δlon are found (full-ring coverage)") {
    // at lat 89.5 a 90° lon gap is only ~78 km across the pole cap
    val got = pairs(Seq((1L, 89.5, 0.0), (2L, 89.5, 90.0)))
      .collect()
    assert(got.length === 1, got.mkString(","))
    assert(got.head.getLong(2) < 100000)
  }

  test("blocked join agrees exactly with the brute-force cross join") {
    // deterministic scatter with clusters at mid and high latitude
    val pts = (0L until 240L).map { i =>
      val lat = ((i * 37) % 170).toDouble - 85.0 + (i % 7) * 0.11
      val lon = ((i * 53) % 360).toDouble - 180.0 + (i % 11) * 0.13
      (i, lat, lon)
    } ++ (1000L until 1040L).map { i => // dense polar cluster
      (i, 88.0 + ((i % 10) * 0.17), ((i * 91) % 360).toDouble - 180.0)
    }
    val df = pts.toDF("id", "lat", "lon")
    val a = df.select(col("id").as("id_a"), col("lat").as("la"), col("lon").as("qa"))
    val b = df.select(col("id").as("id_b"), col("lat").as("lb"), col("lon").as("qb"))
    val brute = a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .withColumn("d", GeoDistanceJoin.haversineKm(col("la"), col("qa"), col("lb"), col("qb")))
      .filter(col("d") <= 100.0)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val blocked = pairs(pts).select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(blocked === brute,
      s"missed: ${(brute -- blocked).take(5)}; extra: ${(blocked -- brute).take(5)}")
    assert(brute.nonEmpty) // the test must actually exercise pairs
  }

  test("output is id_a < id_b, unique, ordered") {
    val rows = pairs(Seq((1L, 50.0, 8.0), (2L, 50.1, 8.1), (3L, 50.2, 8.2),
      (4L, 50.3, 8.3))).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    val ps = rows.map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.toSet.size === ps.length)
    assert(ps.sorted.sameElements(ps))
  }

  test("nearestNeighbors agrees with brute-force per-point ranking") {
    val pts = (0L until 150L).map { i =>
      (i, ((i * 41) % 20).toDouble + 40.0 + (i % 13) * 0.037,
        ((i * 59) % 30).toDouble + 5.0 + (i % 17) * 0.041)
    }
    val df = pts.toDF("id", "lat", "lon")
    val a = df.select(col("id").as("src_id"), col("lat").as("la"), col("lon").as("qa"))
    val b = df.select(col("id").as("neighbor_id"), col("lat").as("lb"), col("lon").as("qb"))
    val brute = a.join(b, col("src_id") =!= col("neighbor_id"))
      .withColumn("dist_m", floor(GeoDistanceJoin.haversineKm(
        col("la"), col("qa"), col("lb"), col("qb")) * 1000.0).cast("long"))
      .filter(GeoDistanceJoin.haversineKm(col("la"), col("qa"), col("lb"), col("qb")) <= 100.0)
      .withColumn("rk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("src_id")
          .orderBy(col("dist_m"), col("neighbor_id"))))
      .filter(col("rk") <= 3)
      .select("src_id", "neighbor_id", "dist_m")
      .as[(Long, Long, Long)].collect().toSet
    val got = GeoDistanceJoin.nearestNeighbors(df, col("id"), col("lat"), col("lon"),
        radiusKm = 100.0, k = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === brute,
      s"missed: ${(brute -- got).take(5)}; extra: ${(got -- brute).take(5)}")
    assert(brute.nonEmpty)
    // every point emits at most k rows
    val perPoint = got.toSeq.groupBy(_._1).values.map(_.size)
    assert(perPoint.forall(_ <= 3))
  }

  test("radius beyond the 1-neighborhood coverage bound is rejected") {
    intercept[IllegalArgumentException] {
      pairs(Seq((1L, 0.0, 0.0)), r = 150.0).collect()
    }
  }
}
