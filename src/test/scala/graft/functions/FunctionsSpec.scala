package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("VecDotF matches the HOF dot product and codegens") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (Array(0.5f, -1.5f), Array(2.0f, 2.0f))
    ).toDF("a", "b")
    val got = df.select(VecOps.dotF(col("a"), col("b"))).as[Double].collect()
    assert(got(0) === 32.0)
    assert(got(1) === 0.5 * 2.0 + -1.5 * 2.0)
  }

  test("VecOps.cosineF of a vector with a scaled copy is ~1") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(0.5f, 1.0f, 1.0f))).toDF("a", "b")
    val c = df.select(VecOps.cosineF(col("a"), col("b"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-6)
  }

  test("WindowPolyHash rolling equals direct per-window polynomial") {
    val xs = Array(7L, -3L, 11L, Long.MaxValue, 42L, -9999L)
    val w = 3
    val base = 1099511628211L
    def poly(a: Seq[Long]): Long = a.foldLeft(0L)((h, x) => h * base + x)
    val expected = xs.sliding(w).map(s => poly(s.toSeq)).toArray
    val got = Seq(Tuple1(xs)).toDF("xs")
      .select(TextHashExprs.windowPolyHash(col("xs"), w, base)).as[Array[Long]].head()
    assert(got.toSeq === expected.toSeq)
  }

  test("WindowPolyHash short input yields single whole-array hash") {
    val base = 31L
    val got = Seq(Tuple1(Array(5L, 6L))).toDF("xs")
      .select(TextHashExprs.windowPolyHash(col("xs"), 8, base)).as[Array[Long]].head()
    assert(got.toSeq === Seq(5L * base + 6L))
  }

  test("MinHashSignature is bit-identical to the xxhash64(h, s) HOF form") {
    val df = Seq(Tuple1(Array(123L, 456L, 789L, -1L))).toDF("hs")
    val p = 8
    val hof = df.select(
      aggregate(col("hs"), array_repeat(lit(Long.MaxValue), p),
        (acc, h) => zip_with(acc, sequence(lit(1L), lit(p.toLong)),
          (m, s) => least(m, xxhash64(h, s))))).as[Array[Long]].head()
    val native = df.select(TextHashExprs.minhashSignature(col("hs"), p))
      .as[Array[Long]].head()
    assert(native.toSeq === hof.toSeq)
  }

  test("BagInstanceHashes numbers occurrences deterministically and order-independently per value") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    def inst(h: Long, c: Int): Long = XXH64.hashLong(c.toLong, XXH64.hashLong(h, 42L))
    val df = Seq(Tuple1(Array(7L, 7L, 3L, 7L, 3L))).toDF("hs")
    val got = df.select(TextHashExprs.bagInstanceHashes(col("hs"))).as[Array[Long]].head()
    assert(got.toSeq === Seq(inst(7L, 0), inst(7L, 1), inst(3L, 0), inst(7L, 2), inst(3L, 1)))
    // two bags with equal multiplicities yield equal instance SETS
    // regardless of element order — the property weighted MinHash needs.
    val other = Seq(Tuple1(Array(3L, 7L, 7L, 3L, 7L))).toDF("hs")
    val got2 = other.select(TextHashExprs.bagInstanceHashes(col("hs"))).as[Array[Long]].head()
    assert(got.toSet === got2.toSet)
  }

  test("SimHash64 matches a scala-side reference tally") {
    val hs = Array(0x0F0FL, 0xFFFF0000L, -42L)
    def ref(hashes: Seq[Long]): Long = {
      val tally = Array.fill(64)(0)
      for (h <- hashes; b <- 0 until 64)
        if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
      (0 until 64).foldLeft(0L)((s, b) => if (tally(b) > 0) s | (1L << b) else s)
    }
    val got = Seq(Tuple1(hs)).toDF("hs")
      .select(TextHashExprs.simhash64(col("hs"))).as[Long].head()
    assert(got === ref(hs.toSeq))
  }

  test("UnicodeNormalize NFC composes; stripAccents removes diacritics") {
    // "é" as e + combining acute (NFD) vs precomposed (NFC)
    val decomposed = "Café"
    val df = Seq(decomposed).toDF("s")
    val nfc = df.select(StringExprs.unicodeNormalize(col("s"), "NFC")).as[String].head()
    assert(nfc === "Café")
    val stripped = df.select(StringExprs.stripAccents(col("s"))).as[String].head()
    assert(stripped === "Cafe")
    val ctrl = Seq("a\u0000b\u009Fc\td").toDF("s")
      .select(StringExprs.stripControlChars(col("s"))).as[String].head()
    assert(ctrl === "abc\td")
  }

  test("MojibakeRepair inverts Latin-1 and cp1252 trips, leaves clean text alone") {
    import java.nio.charset.StandardCharsets.{ISO_8859_1, UTF_8}
    val clean = "Café résumé — naïve"
    val moji1 = new String(clean.getBytes(UTF_8), ISO_8859_1)
    val moji2 = new String(moji1.getBytes(UTF_8), ISO_8859_1)
    assert((moji1 != clean) && (moji2 != moji1))
    assert(MojibakeRepair.fix(moji1) === clean, "one Latin-1 layer")
    assert(MojibakeRepair.fix(moji2) === clean, "two stacked layers")
    // cp1252 reading: UTF-8 of the euro sign through windows-1252
    val euro = "price € 30"
    val mojiCp = new String(euro.getBytes(UTF_8),
      java.nio.charset.Charset.forName("windows-1252"))
    assert(mojiCp.contains('‚'), "cp1252 maps 0x82 to a curly quote")
    assert(MojibakeRepair.fix(mojiCp) === euro, "cp1252 layer")
    // untouchables: ASCII, genuine Latin-1 accents (invalid UTF-8 when
    // re-encoded), and text outside any 8-bit charset
    assert(MojibakeRepair.fix("plain ascii text") === "plain ascii text")
    assert(MojibakeRepair.fix(clean) === clean, "real accents stay")
    assert(MojibakeRepair.fix("日本語") === "日本語")
    // and the expression surface: registered function + Column wrapper agree
    val viaExpr = Seq(moji2).toDF("s")
      .select(StringExprs.fixMojibake(col("s"))).as[String].head()
    assert(viaExpr === clean)
  }

  test("containment flags a near-superset pair that Jaccard misses") {
    import graft.dedup.NGramJaccard
    val small = "one two three four five six seven eight"
    val big = small + " " + Seq.tabulate(40)(i => s"w$i").mkString(" ")
    val docs = Seq((1L, small, "b"), (2L, big, "b")).toDF("doc_id", "text", "blk")
    val cont = NGramJaccard.containmentPairs(docs, col("doc_id"), col("text"), col("blk"),
      n = 3, threshold = 0.8).collect()
    assert(cont.length === 1 && cont(0).getAs[Double]("c_ab") >= 0.8)
    val jac = NGramJaccard.blockedPairs(docs, col("doc_id"), col("text"), col("blk"),
      n = 3, threshold = 0.5).count()
    assert(jac === 0L) // symmetric Jaccard can't see the superset
  }

  test("SortedLongIntersectCount counts the sorted-set intersection") {
    val df = Seq((Array(1L, 3L, 5L, 9L), Array(2L, 3L, 5L, 10L, 11L))).toDF("a", "b")
    val got = df.select(TextHashExprs.sortedIntersectCount(col("a"), col("b")))
      .as[Long].head()
    assert(got === 2L)
  }

  test("BpeEncodeCount applies lowest-rank merges greedily; empty table = char count") {
    import graft.text.TextAnalysis
    val df = Seq((1L, "aaab ab ba"), (2L, "   ")).toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    // the table Vocab.bpeMerges trains on "aaab aaab aaab ab ab"
    val table = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = df.select(col("doc_id"),
        BpeExprs.encodeCount(toks, table).as("n"),
        BpeExprs.encodeCount(toks, Nil).as("n0"))
      .as[(Long, Long, Long)].collect()
      .map { case (i, n, n0) => i -> ((n, n0)) }.toMap
    // aaab→[aaab]=1, ab→[ab]=1, ba (no merge applies)=2 ⇒ 4; chars = 8
    assert(got(1L) === ((4L, 8L)))
    assert(got(2L) === ((0L, 0L))) // whitespace-only doc: zero tokens
  }

  test("BpeEncodeSymbols keeps the symbol stream; size equals BpeEncodeCount") {
    import graft.text.TextAnalysis
    val df = Seq((1L, "aaab ab ba"), (2L, "   ")).toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val table = Seq(("a", "a"), ("a", "b"), ("aa", "ab"))
    val got = df.select(col("doc_id"),
        BpeExprs.encodeSymbols(toks, table).as("syms"),
        BpeExprs.encodeCount(toks, table).as("n"))
      .as[(Long, Seq[String], Long)].collect()
      .map { case (i, s, n) => i -> ((s, n)) }.toMap
    // aaab: aa+ab merge via rank 2 after (a,a),(a,b); ab → [ab]; ba unmergeable
    assert(got(1L)._1 === Seq("aaab", "ab", "b", "a"))
    assert(got(1L)._2 === 4L)
    // concatenation recovers the original token text
    assert(got(1L)._1.mkString === "aaababba")
    assert(got(2L) === ((Seq.empty[String], 0L)))
  }

  test("BpeEncodeSymbols byte level splits non-ASCII into UTF-8 byte symbols") {
    import graft.text.TextAnalysis
    val df = Seq((1L, "é")).toDF("doc_id", "text") // U+00E9 = 0xC3 0xA9
    val toks = TextAnalysis.tokens(col("text"))
    val got = df.select(
        BpeExprs.encodeSymbolsBytes(toks, Nil).as("b"),
        BpeExprs.encodeSymbols(toks, Nil).as("c"))
      .as[(Seq[String], Seq[String])].head()
    assert(got._1.map(_.charAt(0).toInt) === Seq(0xC3, 0xA9))
    assert(got._2 === Seq("é"))
  }

  test("PolyBuckets matches the DuckDB list_reduce replay; drops null elements") {
    // expected values computed with DuckDB 1.0:
    //   list_reduce(list_prepend(0, [unicode(c) for c in g]),
    //     (a,b) -> (a*31+b) % 1000003) % 4096
    val df = Seq(Tuple1(Seq("hello", "a", "the quick", ""))).toDF("gs")
    val got = df.select(StringExprs.polyBuckets(col("gs"), 4096).as("b"))
      .as[Seq[Long]].head()
    assert(got === Seq(2281L, 97L, 2018L, 0L))
    val withNull = Seq(Tuple1(Seq[String]("a", null, "hello"))).toDF("gs")
    assert(withNull.select(StringExprs.polyBuckets(col("gs"), 4096))
      .as[Seq[Long]].head() === Seq(97L, 2281L))
  }

  test("GramBuckets equals polyBuckets over tokens plus space-joined bigrams") {
    val df = Seq(
      Tuple1(Seq("alpha", "beta", "gamma")),
      Tuple1(Seq("solo")),
      Tuple1(Seq.empty[String])).toDF("tk")
    val got = df.select(StringExprs.gramBuckets(col("tk"), 4096).as("b"))
      .as[Seq[Long]].collect().toSeq
    val expected = df.select(StringExprs.polyBuckets(
        concat(col("tk"),
          when(size(col("tk")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(0), size(col("tk")) - 2),
              i => concat_ws(" ",
                element_at(col("tk"), i + 1), element_at(col("tk"), i + 2))))),
        4096).as("b"))
      .as[Seq[Long]].collect().toSeq
    assert(got === expected)
  }

  test("VecDimStatsAgg: hand-checked cells, partition-order invariance, dims contract") {
    val df = Seq(
      (0L, Array(0.5f, -0.25f)),
      (0L, Array(1.5f, 0.1f)),
      (1L, Array(-2.0f, 3.0f))).toDF("label", "embedding")
    def profile(d: org.apache.spark.sql.DataFrame) = d
      .groupBy("label")
      .agg(VecAggExprs.dimStatsMicros(col("embedding"), 2).as("st"))
      .select(col("label"), explode(col("st")).as("s"))
      .select(col("label"), col("s.dim"), col("s.n"), col("s.sum_mu"),
        col("s.min_mu"), col("s.max_mu"), col("s.ssq_hi"), col("s.ssq_lo"),
        col("s.varn_hi"), col("s.varn_lo"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toList.sortBy(t => (t._1, t._2))
    val got = profile(df)
    // second moments by hand: e.g. label 0 dim 0 — m = {500000, 1500000},
    // Σm² = 2.5e12, varn = 2·2.5e12 − (2e6)² = 1e12
    assert(got === List(
      (0L, 0L, 2L, 2000000L, 500000L, 1500000L, 0L, 2500000000000L, 0L, 1000000000000L),
      (0L, 1L, 2L, -150000L, -250000L, 100000L, 0L, 72500000000L, 0L, 122500000000L),
      (1L, 0L, 1L, -2000000L, -2000000L, -2000000L, 0L, 4000000000000L, 0L, 0L),
      (1L, 1L, 1L, 3000000L, 3000000L, 3000000L, 0L, 9000000000000L, 0L, 0L)))
    // merge path: many partitions force partial buffers + merge; cells
    // must be identical (integer micros are merge-order-free)
    assert(profile(df.repartition(7)) === got)
    // ±2800-magnitude elements: each m² = 7.84e18 crosses the 10¹⁸ carry —
    // ssq and varn must come back exact through the (hi, lo) split and the
    // merge path (two single-row partials merged)
    val big = Seq((9L, Array(2800.0f, 0.0f)), (9L, Array(-2800.0f, 0.0f)))
      .toDF("label", "embedding").repartition(2)
    val gotBig = profile(big).filter(_._2 == 0L)
    assert(gotBig === List(
      (9L, 0L, 2L, 0L, -2800000000L, 2800000000L,
        15L, 680000000000000000L, 31L, 360000000000000000L)))
    // same-partition accumulation at the guard's edge (ADVICE r13): five
    // max-magnitude rows in ONE partition walk the pre-carry lo cell up to
    // 0.8788e18, so the fifth add is 9.0984e18 — safe only because the
    // guard is 2867 (m² ≤ 8.2197e18; lo + m² < 2⁶³−1 always). Rows of
    // 2900 under the old ±3000 guard wrapped negative on the third add.
    val edge = (Seq.fill(4)(2867.0f) :+ -2867.0f).map(x => (9L, Array(x, 0.0f)))
      .toDF("label", "embedding").coalesce(1)
    // m = ±2.867e9, m² = 8219689·10¹² each; Σm = 3m, Σm² = 41098445·10¹²,
    // varn = 5·Σm² − (3m)² = 205492225·10¹² − 73977201·10¹² = 131515024·10¹²
    val gotEdge = profile(edge).filter(_._2 == 0L)
    assert(gotEdge === List(
      (9L, 0L, 5L, 8601000000L, -2867000000L, 2867000000L,
        41L, 98445000000000000L, 131L, 515024000000000000L)))
    // a wrong-length vector fails loudly, never silently skews the profile
    val bad = Seq((0L, Array(1.0f, 2.0f, 3.0f))).toDF("label", "embedding")
    val e = intercept[org.apache.spark.SparkException] { profile(bad) }
    assert(e.getMessage.contains("vec_dim_stats") ||
      Option(e.getCause).exists(_.getMessage.contains("vec_dim_stats")))
    // so does an element whose m² would overflow the carry cell
    val huge = Seq((0L, Array(3100.0f, 0.0f))).toDF("label", "embedding")
    val e2 = intercept[org.apache.spark.SparkException] { profile(huge) }
    assert(e2.getMessage.contains("second-moment") ||
      Option(e2.getCause).exists(_.getMessage.contains("second-moment")))
  }

  test("BpeEncodeCount byte level seeds UTF-8 bytes; char level counts UTF-16 units") {
    import graft.text.TextAnalysis
    // "héllo" = 5 chars, 6 UTF-8 bytes; "día" = 3 chars, 4 bytes
    val df = Seq((1L, "héllo día ab")).toDF("doc_id", "text")
    val toks = TextAnalysis.tokens(col("text"))
    val table = Seq(("a", "b"))
    val got = df.select(
        BpeExprs.encodeCountBytes(toks, Nil).as("b0"),
        BpeExprs.encodeCount(toks, Nil).as("c0"),
        BpeExprs.encodeCountBytes(toks, table).as("bt"),
        BpeExprs.encodeCount(toks, table).as("ct"))
      .as[(Long, Long, Long, Long)].head()
    assert(got._1 === 6L + 4L + 2L, "byte seeding")
    assert(got._2 === 5L + 3L + 2L, "char seeding")
    // the ASCII merge (a,b) applies identically at both levels
    assert(got._3 === got._1 - 1L)
    assert(got._4 === got._2 - 1L)
  }
}
