package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MannWhitneySpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long)]) =
    Experiment.mannWhitney(rows.toDF("m", "g", "v"), col("m"), col("g"),
      col("v")).collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4),
        r.getBoolean(5))).toMap

  test("hand-checked U with ties: doubled midranks are exact") {
    // control {1, 2, 2}, treatment {2, 3}: ranks 1, (2,3,4)->3, 5
    // R1 = 3 + 5 = 8 -> r1_2 = 16; U = 8 - 3 = 5 -> u2 = 10; n1n2 = 6
    val m = run(Seq(("t", 0L, 1L), ("t", 0L, 2L), ("t", 0L, 2L),
      ("t", 1L, 2L), ("t", 1L, 3L)))
    val (n1, n2, u2, dir, sig) = m("t")
    assert(n1 === 2L && n2 === 3L && u2 === 10L && dir === 1)
    assert(!sig) // tiny samples cannot be significant
  }

  test("complete separation is significant in the right direction") {
    // treatment entirely above control, n = 40 + 40
    val rows = (1L to 40L).map(v => ("s", 0L, v)) ++
      (41L to 80L).map(v => ("s", 1L, v))
    val (n1, n2, u2, dir, sig) = run(rows)("s")
    assert(n1 === 40L && n2 === 40L)
    assert(u2 === 2L * 40L * 40L) // U = n1*n2 at full separation
    assert(dir === 1 && sig)
    // and mirrored: treatment below -> direction -1, still significant
    val mirrored = run(rows.map { case (m, g, v) => (m, 1L - g, v) })("s")
    assert(mirrored._4 === -1 && mirrored._5)
  }

  test("identical distributions: U at its mean, no significance") {
    val rows = (1L to 30L).flatMap(v => Seq(("t", 0L, v), ("t", 1L, v)))
    val (_, _, u2, dir, sig) = run(rows)("t")
    assert(u2 === 30L * 30L && dir === 0 && !sig)
  }

  test("empty arm: no decision, never significant") {
    val m = run(Seq(("t", 1L, 5L), ("t", 1L, 6L)))
    assert(m("t")._2 === 0L && !m("t")._5)
  }
}
