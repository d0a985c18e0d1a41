package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("interleave produces the Morton code") {
    // a = 0b101 (bits 0,2 → positions 0,4), b = 0b011 (bits 0,1 → 1,3)
    val got = Seq((5L, 3L)).toDF("a", "b")
      .select(ZOrder.interleave(col("a"), col("b"), 4)).as[Long].head()
    assert(got === ((1L << 0) | (1L << 4) | (1L << 1) | (1L << 3)))
  }

  test("z-ordered files bound BOTH dimensions; a single-column sort bounds only one") {
    val customers = table("customer").select("c_custkey", "c_acctbal")
    def perFileSpread(dir: String): (Double, Double) = {
      val back = spark.read.parquet(dir)
        .withColumn("f", input_file_name())
      val ranges = back.groupBy("f").agg(
        (max("c_acctbal") - min("c_acctbal")).as("ra"),
        (max("c_custkey") - min("c_custkey")).cast("double").as("rk"))
      val tot = customers.agg(
        (max("c_acctbal") - min("c_acctbal")).cast("double"),
        (max("c_custkey") - min("c_custkey")).cast("double")).head()
      val r = ranges.agg(avg("ra"), avg("rk")).head()
      (r.getDouble(0) / tot.getDouble(0), r.getDouble(1) / tot.getDouble(1))
    }

    val zDir = Files.createTempDirectory("graft_zorder").toString
    ZOrder.writeZOrdered(customers, zDir, "c_acctbal", "c_custkey", numFiles = 16, bits = 8)
    val (zA, zK) = perFileSpread(zDir)

    val sDir = Files.createTempDirectory("graft_sorted").toString
    customers.repartitionByRange(16, col("c_acctbal"))
      .sortWithinPartitions("c_acctbal").write.mode("overwrite").parquet(sDir)
    val (sA, sK) = perFileSpread(sDir)

    // z-order: every file is a tile — bounded extent in BOTH dims.
    assert(zA < 0.6 && zK < 0.6, s"z-order per-file spreads: acctbal $zA custkey $zK")
    // single-column sort: tight on the sort key, unbounded on the other.
    assert(sA < 0.2, s"sorted layout should bound its sort key, got $sA")
    assert(sK > 0.7, s"sorted layout leaves the other dim unbounded, got $sK")
    // and z-order's second-dim bound is the win over the sorted layout.
    assert(zK < sK / 2)
  }

  test("filesIntersectingBox: z-layout reads strictly fewer files for a 2-dim box") {
    // uniform 2-d grid so both layouts get clean extents
    val grid = (0 until 4096).map(i => (i.toLong % 64L, i.toLong / 64L, i.toLong))
      .toDF("x", "y", "v")
    val zDir = Files.createTempDirectory("graft_zbox").toString
    ZOrder.writeZOrdered(grid, zDir, "x", "y", numFiles = 16, bits = 8)
    val rDir = Files.createTempDirectory("graft_rbox").toString
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(rDir)
    // bottom quarter in both dims: 1/16 of the data
    val (zTot, zHit) = ZOrder.filesIntersectingBox(
      spark.read.parquet(zDir), "x", 0.0, 15.0, "y", 0.0, 15.0)
    val (rTot, rHit) = ZOrder.filesIntersectingBox(
      spark.read.parquet(rDir), "x", 0.0, 15.0, "y", 0.0, 15.0)
    assert(zTot === 16L && rTot === 16L)
    // x-sorted layout: every x-file spans all y, so ~1/4 of files qualify;
    // the z-layout tiles both dims, so the box touches strictly fewer.
    assert(zHit < rHit, s"z-layout hit $zHit of $zTot vs row $rHit of $rTot")
    // and the box rows themselves are identical whatever the layout
    val zRows = spark.read.parquet(zDir)
      .filter(col("x") <= 15 && col("y") <= 15).count()
    assert(zRows === 256L)
  }

  test("filesIntersectingBox on an empty frame returns (0, 0), not an NPE") {
    val empty = Seq.empty[(Long, Long)].toDF("x", "y")
    assert(ZOrder.filesIntersectingBox(empty, "x", 0.0, 1.0, "y", 0.0, 1.0)
      === ((0L, 0L)))
  }
}
