package graft.functions

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property-style tests: each native expression against an independent
  * scala reference over seeded random inputs (empty arrays, extreme longs,
  * mismatched lengths included).
  */
class ExprPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rng = new Random(42)
  private def randLongs(maxLen: Int): Array[Long] =
    Array.fill(rng.nextInt(maxLen + 1))(rng.nextLong())

  test("WindowPolyHash equals the naive per-window fold for any input") {
    val base = 1099511628211L
    def poly(a: Seq[Long]): Long = a.foldLeft(0L)((h, x) => h * base + x)
    val cases = Seq.fill(25)((randLongs(40), 1 + rng.nextInt(8)))
    val df = cases.zipWithIndex.map { case ((xs, w), i) => (i, xs, w) }.toDF("i", "xs", "w")
    cases.zipWithIndex.foreach { case ((xs, w), i) =>
      val expected =
        if (xs.length <= w) Seq(poly(xs.toSeq))
        else xs.sliding(w).map(s => poly(s.toSeq)).toSeq
      val got = df.filter(col("i") === i)
        .select(TextHashExprs.windowPolyHash(col("xs"), w, base))
        .as[Array[Long]].head().toSeq
      assert(got === expected, s"case $i (n=${xs.length}, w=$w)")
    }
  }

  test("SortedLongIntersectCount equals Set intersection size on sorted distinct inputs") {
    (1 to 25).foreach { i =>
      val sa = randLongs(40).distinct.sorted
      val sb = (randLongs(40) ++ sa.take(rng.nextInt(sa.length + 1))).distinct.sorted
      val got = Seq((sa, sb)).toDF("a", "b")
        .select(TextHashExprs.sortedIntersectCount(col("a"), col("b")))
        .as[Long].head()
      assert(got === (sa.toSet & sb.toSet).size.toLong, s"case $i")
    }
  }

  test("VecDotF equals the sequential double fold for any float vectors") {
    (1 to 25).foreach { i =>
      val a = Array.fill(16)(rng.nextFloat() * 2e6f - 1e6f)
      val b = Array.fill(16)(rng.nextFloat() * 2e6f - 1e6f)
      val expected = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x.toDouble * y.toDouble }
      val got = Seq((a, b)).toDF("a", "b")
        .select(VecOps.dotF(col("a"), col("b"))).as[Double].head()
      assert(got === expected, s"case $i")
    }
  }

  test("Sq8DistL2 equals the integer fold for random codes; mismatched lengths throw") {
    (1 to 25).foreach { i =>
      val la = rng.nextInt(70)
      val a = Array.fill(la)((rng.nextInt(256) - 128).toByte)
      val b = Array.fill(la)((rng.nextInt(256) - 128).toByte)
      val expected = (0 until la).foldLeft(0L) { (s, j) =>
        val d = (a(j) - b(j)).toLong; s + d * d
      }
      val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
        .select(VecOps.sq8DistL2(col("a"), col("b"))).as[Long].head()
      assert(got === expected, s"case $i (n=$la)")
    }
    // ADVICE r15: a dimension mismatch means the wrong code table was
    // paired with the query side — fail hard, never truncate to a
    // plausible-looking distance
    val e = intercept[Exception] {
      Seq((Seq[Byte](1, 2, 3), Seq[Byte](1, 2))).toDF("a", "b")
        .select(VecOps.sq8DistL2(col("a"), col("b"))).as[Long].head()
    }
    def rootMsg(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(c => Option(c.getMessage)).mkString(" ")
    assert(rootMsg(e).contains("length mismatch"), s"got: $e")
  }

  test("sq8F clamps the whole float range to [-128, 127] with exact dyadic floors") {
    val edge = Array(Float.MaxValue, Float.MinValue, -3f, 3f, 1.999f, -2.0001f,
      0f, -0f, 0.015624f, 0.015625f, -0.015625f, 1e-9f, -1e-9f)
    val vals = edge ++ Array.fill(40)(rng.nextFloat() * 8f - 4f)
    val got = Seq(Tuple1(vals.toSeq)).toDF("v")
      .select(VecOps.sq8F(col("v"), 6)).as[Seq[Byte]].head()
    vals.zip(got).foreach { case (x, c) =>
      val q = math.max(-128L, math.min(127L, math.floor(x.toDouble * 64.0).toLong))
      assert(c.toLong === q, s"x=$x")
    }
  }

  test("MinHashSignature is monotone under superset (mins can only decrease)") {
    val p = 16
    def sig(xs: Array[Long]): Array[Long] =
      Seq(Tuple1(xs)).toDF("h")
        .select(TextHashExprs.minhashSignature(col("h"), p)).as[Array[Long]].head()
    (1 to 10).foreach { i =>
      val a = randLongs(30)
      val extra = randLongs(10)
      val sa = sig(a)
      val sab = sig(a ++ extra)
      assert(sa.zip(sab).forall { case (x, y) => y <= x }, s"case $i")
    }
  }

  test("BpeEncodeCount equals an independent list-based encode for random words/tables") {
    // independent reference: immutable-list greedy encode, lowest rank
    // first, all occurrences left-to-right per application
    def refEncode(word: String, merges: Seq[(String, String)]): Int = {
      val rank = merges.zipWithIndex.toMap
      var syms: List[String] = word.map(_.toString).toList
      var continue = true
      while (continue) {
        val applicable = syms.zip(syms.drop(1)).flatMap(p => rank.get(p).map(p -> _))
        if (applicable.isEmpty) continue = false
        else {
          val (l, r) = applicable.minBy(_._2)._1
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: t if a == l && b == r => out += (l + r); rest = t
            case a :: t => out += a; rest = t
            case Nil => ()
          }
          syms = out.toList
        }
      }
      syms.length
    }
    val alphabet = "abcd"
    def randWord(): String =
      Array.fill(1 + rng.nextInt(10))(alphabet(rng.nextInt(alphabet.length))).mkString
    (1 to 15).foreach { i =>
      val words = Seq.fill(1 + rng.nextInt(6))(randWord())
      // random table over short symbols (some inapplicable — fine)
      val table = Seq.fill(rng.nextInt(8))((randWord().take(2), randWord().take(2))).distinct
      val expected = words.map(w => refEncode(w, table).toLong).sum
      val got = Seq(Tuple1(words)).toDF("ws")
        .select(BpeExprs.encodeCount(col("ws"), table)).as[Long].head()
      assert(got === expected, s"case $i words=$words table=$table")
      // empty table degenerates to character count
      val chars = Seq(Tuple1(words)).toDF("ws")
        .select(BpeExprs.encodeCount(col("ws"), Nil)).as[Long].head()
      assert(chars === words.map(_.length.toLong).sum, s"case $i chars")
      // a longer table never increases the count
      val shorter = Seq(Tuple1(words)).toDF("ws")
        .select(BpeExprs.encodeCount(col("ws"), table.take(table.length / 2)))
        .as[Long].head()
      assert(got <= shorter, s"case $i monotone")
    }
  }
}
