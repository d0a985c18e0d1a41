package graft.etl

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvmSpec extends SparkSpec {
  import spark.implicits._

  private def agg(df: org.apache.spark.sql.DataFrame) =
    df.groupBy("k").agg(count(lit(1)).as("n_rows"), sum("v").as("sum_v"))

  test("inserts, deletes, new groups and vanishing groups") {
    val base = Seq(("a", 10L), ("a", 20L), ("b", 5L)).toDF("k", "v")
    val ins = Seq(("a", 1L), ("c", 7L)).toDF("k", "v") // c is a NEW group
    val del = Seq(("b", 5L)).toDF("k", "v")            // b vanishes
    val out = Ivm.maintain(agg(base), ins, del, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") === ((3L, 31L)))
    assert(out("c") === ((1L, 7L)))
    assert(!out.contains("b"))
  }

  test("maintained view equals from-scratch on the lineitem slices") {
    val li = table("lineitem")
    val qty = expr("CAST(round(l_quantity * 100) AS BIGINT)")
    val keys = Seq("l_returnflag", "l_linestatus")
    val base = li.filter(col("l_orderkey") % 10 =!= 0)
    val view = base.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(qty).as("sum_v"))
    val maintained = Ivm.maintain(view,
        li.filter(col("l_orderkey") % 10 === 0),
        base.filter(col("l_orderkey") % 20 === 5), keys, qty)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val scratch = li.filter(
        (col("l_orderkey") % 10 =!= 0 && col("l_orderkey") % 20 =!= 5) ||
          col("l_orderkey") % 10 === 0)
      .groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(qty).as("s"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(maintained === scratch)
  }

  test("empty delta is the identity") {
    val base = Seq(("a", 10L)).toDF("k", "v")
    val empty = base.limit(0)
    val out = Ivm.maintain(agg(base), empty, empty, Seq("k"), col("v"))
      .collect()
    assert(out.length === 1 && out(0).getLong(1) === 1L &&
      out(0).getLong(2) === 10L)
  }
}
