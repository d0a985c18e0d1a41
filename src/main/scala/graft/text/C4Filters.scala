package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 heuristic cleaning rules (Raffel et al. 2020, §2.2 — the
  * published filter set behind the C4 corpus), adapted document-level for
  * text without line structure: each rule is a pure per-row predicate, so
  * the whole filter is one stateless projection — no shuffle, batch or
  * streaming — and each flag is independently reportable (the funnel
  * metric quality teams read before deciding which rule to relax).
  *
  * Rules (flag TRUE = passes):
  *  - `f_min_words`  — at least `minWords` whitespace tokens;
  *  - `f_terminal_punct` — trimmed text ends in terminal punctuation
  *    (./!/?/closing quote), C4's "lines must end in punctuation";
  *  - `f_no_brace`   — no '{' (C4 drops anything with code braces);
  *  - `f_no_lorem`   — no "lorem ipsum" (case-insensitive);
  *  - `f_no_script`  — no "javascript" token (C4's noisiest-line rule);
  *  - `f_word_len`   — longest token ≤ `maxWordLen` chars (SEO/hash junk).
  *
  * `keep` is the conjunction. Every predicate is exactly replayable in
  * SQL (regex + length arithmetic), so the per-document flag table
  * hash-checks against an external engine.
  */
object C4Filters {

  def flags(docs: DataFrame, id: Column, text: Column,
            minWords: Int = 5, maxWordLen: Int = 50): DataFrame = {
    val toked = docs.select(id.as("doc_id"), text.as("__c4_text"),
      TextAnalysis.tokens(text).as("__c4_tk"))
    val lowered = lower(col("__c4_text"))
    val flagged = toked.select(
      col("doc_id"),
      (size(col("__c4_tk")) >= minWords).as("f_min_words"),
      trim(col("__c4_text")).rlike("[.!?\"']$").as("f_terminal_punct"),
      (!col("__c4_text").contains("{")).as("f_no_brace"),
      (!lowered.contains("lorem ipsum")).as("f_no_lorem"),
      (!lowered.rlike("\\bjavascript\\b")).as("f_no_script"),
      coalesce(
        aggregate(col("__c4_tk"), lit(0),
          (acc, t) => greatest(acc, length(t))) <= maxWordLen,
        lit(true)).as("f_word_len"))
    flagged.withColumn("keep",
        col("f_min_words") && col("f_terminal_punct") && col("f_no_brace") &&
          col("f_no_lorem") && col("f_no_script") && col("f_word_len"))
      .orderBy("doc_id")
  }
}
