package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(pts: Seq[(Long, Long, Long)], buckets: Int = 64) =
    Skyline.skyline2d(pts.toDF("id", "x", "y"), col("id"), col("x"),
      col("y"), buckets).collect().map(_.getLong(0)).toSet

  /** Reference skyline by the definition. */
  private def brute(pts: Seq[(Long, Long, Long)]): Set[Long] =
    pts.filter { case (_, x, y) =>
      !pts.exists { case (_, bx, by) =>
        bx <= x && by <= y && (bx < x || by < y)
      }
    }.map(_._1).toSet

  test("hand cases: staircase, dominated interior, duplicates survive") {
    val pts = Seq(
      (1L, 1L, 9L), (2L, 3L, 7L), (3L, 5L, 5L), (4L, 7L, 3L), (5L, 9L, 1L), // staircase
      (6L, 6L, 6L),            // dominated by (3,5,5)
      (7L, 3L, 7L),            // duplicate of 2 -> both survive
      (8L, 3L, 8L)             // same x as 2, worse y -> dominated
    )
    assert(sky(pts) === Set(1L, 2L, 3L, 4L, 5L, 7L))
  }

  test("matches brute force on pseudo-random clouds at several bucket counts") {
    val rnd = new scala.util.Random(42)
    val pts = (1L to 500L).map(i =>
      (i, rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val expected = brute(pts)
    for (b <- Seq(1, 7, 64, 500))
      assert(sky(pts, b) === expected, s"buckets=$b")
  }

  test("single point, all-equal points, one bucket span") {
    assert(sky(Seq((1L, 5L, 5L))) === Set(1L))
    assert(sky(Seq((1L, 5L, 5L), (2L, 5L, 5L), (3L, 5L, 5L))) === Set(1L, 2L, 3L))
  }

  test("parts skyline is mutually non-dominating and excludes the rest") {
    val parts = table("part").withColumn("cents",
      expr("CAST(round(p_retailprice * 100) AS BIGINT)"))
    val out = Skyline.skyline2d(parts, col("p_partkey"), col("cents"),
      col("p_size")).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    // pairwise non-domination on the frontier
    for ((ia, xa, ya) <- out; (ib, xb, yb) <- out if ia != ib)
      assert(!(xb <= xa && yb <= ya && (xb < xa || yb < ya)))
  }
}
