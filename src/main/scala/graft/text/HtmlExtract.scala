package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction — the first transform every web-crawl corpus
  * runs (the trafilatura/jusText step, reduced to its deterministic
  * core): drop script/style subtrees wholesale, strip the remaining
  * tags, decode the ubiquitous character entities, collapse whitespace.
  *
  * One chain of codegen'd `regexp_replace` projections — no UDF, no
  * parser state — so it inlines into whole-stage codegen, runs
  * unchanged in Structured Streaming, and the DuckDB oracle replays the
  * identical chain byte-for-byte. A production lane swaps in a real
  * DOM/readability extractor for layout-aware main-content selection;
  * the column contract (dirty HTML in, clean text out, same row) is
  * this one.
  *
  * Order matters and is part of the contract: subtree drops run BEFORE
  * tag stripping (otherwise script BODIES would survive as text),
  * entity decode runs AFTER (otherwise `&lt;script&gt;` would fabricate
  * tags to strip), and the whitespace collapse runs last.
  */
object HtmlExtract {

  // The oracle replays this chain in DuckDB, whose regex engine is RE2 —
  // so the patterns must stay in the subset where Java regex and RE2
  // AGREE SEMANTICALLY, not just syntactically:
  //   - no backreferences (RE2 has none) → explicit script|style branches;
  //   - no `\s` (Java's matches vertical tab \x0B, RE2's does not) →
  //     the explicit class [ \t\n\r\f\x0B], identical in both;
  //   - no `(?i)` (RE2 case-folds Unicode — U+017F ſ, U+212A K — where
  //     Java folds ASCII only) → explicit [sS][cC]... letter classes.
  private val Ws = "[ \\t\\n\\r\\f\\x0B]"
  private val ScriptStyleRe =
    "(?s)<[sS][cC][rR][iI][pP][tT]\\b[^>]*>.*?</[sS][cC][rR][iI][pP][tT]" + Ws + "*>" +
      "|<[sS][tT][yY][lL][eE]\\b[^>]*>.*?</[sS][tT][yY][lL][eE]" + Ws + "*>"
  private val TagRe = "(?s)<[^>]*>"

  /** Clean text out of an HTML column. */
  def extractText(html: Column): Column = {
    val noSubtrees = regexp_replace(html, ScriptStyleRe, " ")
    val noTags = regexp_replace(noSubtrees, TagRe, " ")
    val decoded =
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(noTags, "&nbsp;", " "),
              "&lt;", "<"),
            "&gt;", ">"),
          "&quot;", "\""),
        "&amp;", "&") // last: &amp;lt; must decode to &lt;, not <
    trim(regexp_replace(decoded, Ws + "+", " "))
  }
}
