package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RfmSpec extends SparkSpec {
  import spark.implicits._

  private def day(d: Int) = new Timestamp(1700000000000L + d * 86400000L)

  test("scores and segments on a hand-built order log") {
    // 4 customers, clearly separated R/F/M quartiles:
    //   c1: recent, frequent, rich   -> 4/4/4 champion
    //   c2: recent-ish, mid          -> loyal band
    //   c3: old, infrequent, mid     -> hibernating band
    //   c4: oldest, single, poor     -> hibernating band
    val orders =
      (0 until 8).map(i => (1L, day(30 + i % 2), 1000L)) ++
        (0 until 4).map(i => (2L, day(20), 500L)) ++
        Seq((3L, day(5), 300L), (3L, day(6), 300L)) ++
        Seq((4L, day(0), 100L))
    val df = orders.toDF("cust", "dt", "cents")
    val out = Rfm.rfmCells(df, col("cust"), col("dt"), col("cents"))
      .collect()
    val cells = out.map(r => (r.getInt(0), r.getInt(1), r.getInt(2),
      r.getString(3), r.getLong(4), r.getLong(5)))
    // every customer lands in exactly one cell
    assert(cells.map(_._5).sum === 4L)
    // c1 is the champion cell with its full 8000 cents
    val champ = cells.filter(_._4 == "champion")
    assert(champ.length === 1 && champ.head._5 === 1L && champ.head._6 === 8000L)
    // the two stale customers score r=1 or 2 and are hibernating
    assert(cells.filter(_._4 == "hibernating").map(_._5).sum === 2L)
  }

  test("grid is bounded and conserves customers and cents on orders") {
    val o = table("orders")
    val out = Rfm.rfmCells(o, col("o_custkey"), col("o_orderdate"),
      expr("CAST(round(o_totalprice * 100) AS BIGINT)")).collect()
    assert(out.length <= 64)
    assert(out.map(_.getLong(4)).sum === o.select("o_custkey").distinct().count())
    val cents = o.select(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))"))
      .collect()(0).getLong(0)
    assert(out.map(_.getLong(5)).sum === cents)
    // scores stay in 1..4 and several segments appear
    assert(out.forall(r => (1 to 4).contains(r.getInt(0)) &&
      (1 to 4).contains(r.getInt(1)) && (1 to 4).contains(r.getInt(2))))
    assert(out.map(_.getString(3)).distinct.length >= 3)
  }
}
