package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Gopher rule flags (Rae et al. 2021, Table A1). One fixture per rule
  * that fails it ALONE against a passing base document, so each flag's
  * predicate — and the keep conjunction's structure — is pinned
  * independently; plus boundary cases for the integer ratio forms.
  */
class GopherFiltersSpec extends SparkSpec {
  import spark.implicits._

  // 100 words, mean word length 5.0, stop words {the, and, with}, all
  // alphabetic, single line, no symbols — passes every rule.
  private val clean = (0 until 10).map(i =>
    s"the committee and the board discussed item$i with care today").mkString(" ")

  private def flagsOf(rows: (Long, String)*): Map[Long, Map[String, Boolean]] = {
    val df = GopherFilters.flags(rows.toDF("doc_id", "text"),
      col("doc_id"), col("text"))
    val names = df.columns.filter(c => c.startsWith("f_") || c == "keep")
    df.collect().map { r =>
      r.getLong(0) -> names.map(n => n -> r.getBoolean(r.fieldIndex(n))).toMap
    }.toMap
  }

  test("each rule fails on exactly its planted breaker") {
    val pad = clean + " " // appended breakers keep the base rules green
    val got = flagsOf(
      1L -> clean,
      2L -> "too few words here",
      3L -> Seq.fill(60)("pneumonoultramicroscopicsilico").mkString(" "),
      4L -> (clean + " " + Seq.fill(300)("a").mkString(" ")), // mean 800/400 < 3
      5L -> (pad + Seq.fill(60)("#").mkString(" ")),        // symbol ratio
      6L -> (pad + "\n" + (0 until 20).map(i => s"- item $i").mkString("\n")),
      7L -> (pad + "\n" + (0 until 10).map(i => s"trailing line $i goes on...").mkString("\n")),
      8L -> (pad + (1000 until 1060).map(_.toString).mkString(" ")), // alpha < 80%
      9L -> Seq.fill(20)("alpha beta gamma delta epsilon zeta").mkString(" "),
      10L -> (pad + "\n" + Seq.fill(20)("this line repeats verbatim").mkString("\n")),
      11L -> (pad + "\n\n" +
        Seq.fill(10)("para line one\npara line two").mkString("\n\n")))
    assert(got(1L).values.forall(identity), s"clean doc must pass all: ${got(1L)}")
    assert(!got(2L)("f_word_count"))
    assert(!got(3L)("f_mean_word_len"), "mean length above 10")
    assert(!got(4L)("f_mean_word_len"), "mean length below 3")
    assert(!got(5L)("f_symbol_ratio"))
    assert(!got(6L)("f_bullet_lines"))
    assert(!got(7L)("f_ellipsis_lines"))
    assert(!got(8L)("f_alpha_words"))
    assert(!got(9L)("f_stop_words"))
    assert(!got(10L)("f_dup_lines") && !got(10L)("f_dup_line_chars"))
    assert(!got(11L)("f_dup_paras") && !got(11L)("f_dup_para_chars"))
    (2L to 11L).foreach(i => assert(!got(i)("keep"), s"doc $i must not keep"))
  }

  test("integer ratio boundaries are inclusive on the pass side") {
    // exactly mean length 3 and exactly mean length 10 both pass;
    // exactly 50 words passes; 49 fails.
    val w3 = Seq.fill(50)("the") ++ Seq.fill(2)("and") ++ Seq.fill(2)("with")
    val got = flagsOf(
      1L -> w3.mkString(" "),                                // mean exactly 3
      2L -> (Seq("the", "and") ++ Seq.fill(48)("abcdefghij")).mkString(" "),
      3L -> (Seq("the", "and") ++ Seq.fill(47)("abcdefgh")).mkString(" "))
    assert(got(1L)("f_mean_word_len") && got(1L)("f_word_count"))
    assert(got(2L)("f_mean_word_len"), "mean just under 10 passes")
    assert(got(2L)("f_word_count"), "exactly 50 words passes")
    assert(!got(3L)("f_word_count"), "49 words fails")
  }

  test("gramRunStats: hand-computed top and duplicated n-gram characters") {
    // "a b a b a b c": 2-grams = [a b, b a, a b, b a, a b, b c] sorted
    // -> runs: "a b"x3, "b a"x2, "b c"x1. top = 3*len("a b")=9;
    // dup = (3-1)*3 + (2-1)*3 + 0 = 9.
    val df = Seq((1L, "a b a b a b c")).toDF("doc_id", "text")
    val r = df.select(GopherFilters.gramRunStats(
        graft.text.TextAnalysis.tokens(col("text")), 2).as("r"))
      .select(col("r.top_chars"), col("r.dup_chars"))
      .as[(Long, Long)].head()
    assert(r === ((9L, 9L)))
    // tie-break: "b b a a" -> 2-grams [b b, b a, a a] all count 1; the
    // top slot keeps the LEXICOGRAPHICALLY SMALLEST ("a a", 3 chars).
    val t = Seq((1L, "b b a a")).toDF("doc_id", "text")
      .select(GopherFilters.gramRunStats(
        graft.text.TextAnalysis.tokens(col("text")), 2).as("r"))
      .select(col("r.top_chars"), col("r.dup_chars"))
      .as[(Long, Long)].head()
    assert(t === ((3L, 0L)))
    // fewer tokens than n -> zero grams, zero stats
    val z = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(GopherFilters.gramRunStats(
        graft.text.TextAnalysis.tokens(col("text")), 5).as("r"))
      .select(col("r.top_chars"), col("r.dup_chars"))
      .as[(Long, Long)].head()
    assert(z === ((0L, 0L)))
  }

  test("ngramFlags: a contiguous repeat fails all nine rules, clean prose passes") {
    // note: the stop-word `clean` fixture is REPETITIVE by construction
    // (its phrase repeats 10x), so repetition rules need their own
    // non-repetitive passage: 60 distinct words
    val prose = (0 until 60).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, prose),
      (2L, Seq.fill(30)("ja ja").mkString(" "))).toDF("doc_id", "text")
    val got = GopherFilters.ngramFlags(df, col("doc_id"), col("text"))
    val flags = got.columns.filter(c => c.startsWith("f_") || c == "keep")
    val rows = got.collect().map(r =>
      r.getLong(0) -> flags.map(n => r.getBoolean(r.fieldIndex(n))).toSeq).toMap
    assert(rows(1L).forall(identity), "distinct prose passes every repetition rule")
    assert(rows(2L).forall(!_), "the degenerate repeat fails every rule")
  }

  test("single-line single-paragraph documents have zero dup fractions") {
    val got = flagsOf(1L -> clean)
    assert(got(1L)("f_dup_lines") && got(1L)("f_dup_paras") &&
      got(1L)("f_dup_line_chars") && got(1L)("f_dup_para_chars"))
  }
}
