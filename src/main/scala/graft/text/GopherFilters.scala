package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The published Gopher quality rules (Rae et al. 2021, "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", Table A1)
  * — the most-cited heuristic filter set after C4, document-level: every
  * rule is a pure per-row predicate over the token/line/paragraph lists,
  * so the whole filter is one stateless projection (no shuffle, batch or
  * streaming) and each flag is independently reportable, the funnel form
  * curation teams read before relaxing a rule.
  *
  * Flag TRUE = the document PASSES that rule:
  *  - `f_word_count`     — 50 <= words <= 100,000;
  *  - `f_mean_word_len`  — mean word length in [3, 10] chars (integer
  *    form `3n <= chars <= 10n`, exact on any engine);
  *  - `f_symbol_ratio`   — (# '#' chars + # '...' runs) / words <= 0.1;
  *  - `f_bullet_lines`   — <= 90% of lines start with a bullet (-, *, •);
  *  - `f_ellipsis_lines` — <= 30% of lines end with an ellipsis (... or …);
  *  - `f_alpha_words`    — >= 80% of words contain an alphabetic char;
  *  - `f_stop_words`     — contains >= 2 of the 8 Gopher stop words
  *    (the, be, to, of, and, that, have, with);
  *  - `f_dup_lines`      — duplicate-line fraction <= 0.30;
  *  - `f_dup_paras`      — duplicate-paragraph fraction <= 0.30;
  *  - `f_dup_line_chars` — chars inside repeat occurrences of a line
  *    (beyond each line's first) <= 20% of line chars;
  *  - `f_dup_para_chars` — same at paragraph granularity <= 20%.
  *
  * Every ratio gate is evaluated in INTEGER cross-multiplied form
  * (`10*x <= 3*n` instead of `x/n <= 0.3`), so the flags are exact and
  * engine-portable — no float division anywhere. `keep` is the
  * conjunction. Words are [[TextAnalysis.tokens]] (lowercased whitespace
  * split); lines split on \n, paragraphs on \n\n, empties dropped.
  *
  * The repeat-count scans inside the dup-char fractions are O(distinct x
  * lines) per document over bounded in-row arrays — list work inside one
  * projection, which is exactly where per-document analysis belongs at
  * 100 TB (the alternative, explode + groupBy, would shuffle every line
  * of the corpus).
  */
object GopherFilters {

  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The REPETITION half of Gopher Table A1 — the n-gram rules [[flags]]
    * does not cover: fraction of characters inside the MOST COMMON
    * {2,3,4}-gram (thresholds 0.20/0.18/0.16) and inside DUPLICATED
    * {5..10}-grams (0.15/0.14/0.13/0.12/0.11/0.10). Convention
    * (documented because published reimplementations differ on overlap
    * handling): grams are word n-grams joined by single spaces; the top
    * fraction counts count x len(gram) characters; the duplicated
    * fraction counts (count - 1) x len(gram) per distinct gram with
    * count >= 2 (occurrences beyond the first, no overlap dedup); the
    * denominator is len(concat_ws(' ', tokens)). Every gate is an
    * integer cross-multiplication — exact on any engine.
    *
    * Scale shape: ONE hash-map pass per document inside the native
    * [[graft.functions.GramRepetitionStats]] expression — O(total gram
    * chars) per doc, no gram explode, no shuffle (the corpus-wide
    * alternative, explode + groupBy over every gram of every doc,
    * would shuffle the tokenized corpus 9 times; the interpreted
    * sort-and-fold HOF formulation this started as cost ~13 s at sf0.1
    * — the native loop is ~20×, the repo's standing hot-path rule).
    * The oracle replays via unnest + group-by, identical integers.
    *
    * Returns (top_chars, dup_chars) for one n over a token array.
    */
  def gramRunStats(tk: Column, n: Int): Column =
    graft.functions.TextHashExprs.gramRepetitionStats(tk, n)

  /** Per-document repetition report: the 9 Gopher n-gram rules as
    * value-certified integer columns (numerators + denominator) plus a
    * flag per rule and the conjunction. Thresholds gate in cross-
    * multiplied integer form (e.g. top-2-gram <= 0.20 <=> 5*chars <=
    * total).
    */
  def ngramFlags(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tk = TextAnalysis.tokens(text)
    val withStats = docs.select(id.as("doc_id"), tk.as("__tk"))
      .select(
        col("doc_id"),
        length(concat_ws(" ", col("__tk"))).cast("long").as("total_chars"),
        gramRunStats(col("__tk"), 2).getField("top_chars").as("top2_chars"),
        gramRunStats(col("__tk"), 3).getField("top_chars").as("top3_chars"),
        gramRunStats(col("__tk"), 4).getField("top_chars").as("top4_chars"),
        gramRunStats(col("__tk"), 5).getField("dup_chars").as("dup5_chars"),
        gramRunStats(col("__tk"), 6).getField("dup_chars").as("dup6_chars"),
        gramRunStats(col("__tk"), 7).getField("dup_chars").as("dup7_chars"),
        gramRunStats(col("__tk"), 8).getField("dup_chars").as("dup8_chars"),
        gramRunStats(col("__tk"), 9).getField("dup_chars").as("dup9_chars"),
        gramRunStats(col("__tk"), 10).getField("dup_chars").as("dup10_chars"))
    // thresholds x100: top 20/18/16, dup 15/14/13/12/11/10
    val gates = Seq(
      ("f_top2", col("top2_chars") * 100L <= col("total_chars") * 20L),
      ("f_top3", col("top3_chars") * 100L <= col("total_chars") * 18L),
      ("f_top4", col("top4_chars") * 100L <= col("total_chars") * 16L),
      ("f_dup5", col("dup5_chars") * 100L <= col("total_chars") * 15L),
      ("f_dup6", col("dup6_chars") * 100L <= col("total_chars") * 14L),
      ("f_dup7", col("dup7_chars") * 100L <= col("total_chars") * 13L),
      ("f_dup8", col("dup8_chars") * 100L <= col("total_chars") * 12L),
      ("f_dup9", col("dup9_chars") * 100L <= col("total_chars") * 11L),
      ("f_dup10", col("dup10_chars") * 100L <= col("total_chars") * 10L))
    gates.foldLeft(withStats) { case (df, (nm, c)) => df.withColumn(nm, c) }
      .withColumn("keep", gates.map(_._2).reduce(_ && _))
      .orderBy("doc_id")
  }

  def flags(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val tk = TextAnalysis.tokens(text)
    val lines = filter(split(text, "\n"), l => length(l) > 0)
    val paras = filter(split(text, "\n\n"), p => length(p) > 0)

    // chars inside repeat occurrences (beyond the first) of each distinct
    // element, and total chars, over an in-row string array
    def dupChars(xs: Column): Column =
      aggregate(array_distinct(xs), lit(0L),
        (acc, d) => acc + (size(filter(xs, x => x === d)) - 1).cast("long") * length(d))
    def totChars(xs: Column): Column =
      aggregate(xs, lit(0L), (acc, x) => acc + length(x).cast("long"))

    val nHash = (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
    val nEllipsisRuns =
      ((length(text) - length(replace(text, lit("..."), lit("")))) / 3).cast("long")

    docs.select(
        id.as("doc_id"),
        tk.as("__tk"), lines.as("__ln"), paras.as("__pp"),
        (nHash + nEllipsisRuns).as("__sym"))
      .select(
        col("doc_id"),
        size(col("__tk")).cast("long").as("n_words"),
        size(col("__ln")).cast("long").as("n_lines"),
        totChars(col("__tk")).as("__chars"),
        col("__sym"),
        size(filter(col("__tk"), t => t.rlike("[a-z]"))).cast("long").as("__alpha"),
        size(filter(typedLit(StopWords),
          s => array_contains(col("__tk"), s))).cast("long").as("__stops"),
        size(filter(col("__ln"), l => l.rlike("^\\s*[-*•]"))).cast("long").as("__bullet"),
        size(filter(col("__ln"),
          l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long").as("__ellip"),
        size(array_distinct(col("__ln"))).cast("long").as("__dln"),
        size(col("__pp")).cast("long").as("__np"),
        size(array_distinct(col("__pp"))).cast("long").as("__dpp"),
        dupChars(col("__ln")).as("__dlc"), totChars(col("__ln")).as("__tlc"),
        dupChars(col("__pp")).as("__dpc"), totChars(col("__pp")).as("__tpc"))
      .select(
        col("doc_id"), col("n_words"),
        (col("n_words") >= 50L && col("n_words") <= 100000L).as("f_word_count"),
        (lit(3L) * col("n_words") <= col("__chars") &&
          col("__chars") <= lit(10L) * col("n_words")).as("f_mean_word_len"),
        (lit(10L) * col("__sym") <= col("n_words")).as("f_symbol_ratio"),
        (lit(10L) * col("__bullet") <= lit(9L) * col("n_lines")).as("f_bullet_lines"),
        (lit(10L) * col("__ellip") <= lit(3L) * col("n_lines")).as("f_ellipsis_lines"),
        (lit(5L) * col("__alpha") >= lit(4L) * col("n_words")).as("f_alpha_words"),
        (col("__stops") >= 2L).as("f_stop_words"),
        (lit(10L) * (col("n_lines") - col("__dln")) <= lit(3L) * col("n_lines"))
          .as("f_dup_lines"),
        (lit(10L) * (col("__np") - col("__dpp")) <= lit(3L) * col("__np"))
          .as("f_dup_paras"),
        (lit(5L) * col("__dlc") <= col("__tlc")).as("f_dup_line_chars"),
        (lit(5L) * col("__dpc") <= col("__tpc")).as("f_dup_para_chars"))
      .withColumn("keep",
        col("f_word_count") && col("f_mean_word_len") && col("f_symbol_ratio") &&
          col("f_bullet_lines") && col("f_ellipsis_lines") && col("f_alpha_words") &&
          col("f_stop_words") && col("f_dup_lines") && col("f_dup_paras") &&
          col("f_dup_line_chars") && col("f_dup_para_chars"))
      .orderBy("doc_id")
  }
}
