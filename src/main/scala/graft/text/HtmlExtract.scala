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

  // two explicit alternation branches, NOT a backreferenced `</\1>`:
  // the oracle replays this chain in DuckDB, whose RE2 engine has no
  // backreferences — the pattern must stay in the common regex subset.
  private val ScriptStyleRe =
    "(?is)<script\\b[^>]*>.*?</script\\s*>|<style\\b[^>]*>.*?</style\\s*>"
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
    trim(regexp_replace(decoded, "\\s+", " "))
  }
}
