package graft.analytics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UniformitySpec extends SparkSpec {
  import spark.implicits._

  private def run(cells: Seq[(String, Long, Long)], k: Int,
                  crit: Long = 12592000L) =
    Experiment.uniformity(cells.toDF("m", "cat", "c"), col("m"), col("cat"),
      col("c"), k, crit).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(3),
        r.getBoolean(4), r.getInt(5), r.getLong(6))).toMap

  test("flat distribution scores zero; skew rejects; peak ties to smallest cat") {
    val flat = (0L until 7L).map(d => ("flat", d, 100L))
    val skew = Seq(("skew", 0L, 600L), ("skew", 1L, 600L)) ++
      (2L until 7L).map(d => ("skew", d, 20L))
    val m = run(flat ++ skew, 7)
    assert(m("flat") === ((700L, 0L, false, 0, 100L)))
    val (n, chi, rej, peak, pc) = m("skew")
    assert(n === 1300L && rej && peak === 0 && pc === 600L)
    // chi2 = sum (7c-N)^2/(7N): c=600 -> (4200-1300)^2=8.41e6 x2;
    // c=20 -> (140-1300)^2=1.3456e6 x5 -> (16.82e6+6.728e6)/9100 = 2587.69...
    assert(chi > 2587000000L && chi < 2588000000L, chi.toString)
  }

  test("absent categories contribute their zero-count terms") {
    // one category holds all 70: present term (7*70-70)^2*1e6/(7*70)
    // = 420^2*1e6/490 = 360000000; six absent terms 70*1e6/7 = 1e7 each
    val m = run(Seq(("one", 3L, 70L)), 7)
    val (_, chi, rej, peak, _) = m("one")
    assert(chi === 360000000L + 6L * 10000000L)
    assert(rej && peak === 3)
  }

  test("critical threshold is inclusive and respected near the boundary") {
    // k=2: c=(61,39): chi2 = (2*61-100)^2/(2*100)*2 terms ->
    // (22^2 + 22^2)*1e6/200 = 4840000 micro = 4.84 vs crit 3841459 (df1)
    val m = run(Seq(("b", 0L, 61L), ("b", 1L, 39L)), 2, crit = 3841459L)
    assert(m("b")._3)
    val m2 = run(Seq(("b", 0L, 59L), ("b", 1L, 41L)), 2, crit = 3841459L)
    assert(!m2("b")._3) // chi2 = 3.24 < 3.84
  }

  test("categories outside [0,1023] fail loudly instead of corrupting the pack") {
    val bad = Seq(("m", -1L, 5L)).toDF("m", "cat", "c")
    val e = intercept[Exception] {
      Experiment.uniformity(bad, col("m"), col("cat"), col("c"), 7,
        12592000L).collect()
    }
    assert(e.getMessage != null)
  }
}
