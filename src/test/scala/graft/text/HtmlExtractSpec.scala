package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq((1L, html)).toDF("id", "html")
      .select(HtmlExtract.extractText(col("html"))).as[String].head()

  test("script and style subtrees vanish wholesale, including their bodies") {
    assert(extract(
      "<p>keep</p><script>var dropMe = 'x < y';</script><p>also</p>") ===
      "keep also")
    assert(extract("<STYLE type='css'>.a { color: red }</STYLE>rest") === "rest")
    // multiline bodies ((?s) dotall) and attribute-bearing tags
    assert(extract("<script src='x.js'>\nline1\nline2\n</script>text") === "text")
  }

  test("tags strip, entities decode, whitespace collapses — in that order") {
    assert(extract("<div>a&nbsp;&nbsp;b</div>") === "a b")
    assert(extract("<b>bold</b> &lt;i&gt;not-a-tag&lt;/i&gt; &quot;q&quot; a&amp;b") ===
      "bold <i>not-a-tag</i> \"q\" a&b")
    // double-encoded: &amp;lt; is the TEXT "&lt;", never a tag to strip
    assert(extract("x &amp;lt;script&amp;gt; y") === "x &lt;script&gt; y")
    assert(extract("  <p>  spaced   out  </p>  ") === "spaced out")
  }

  test("text without markup passes through trimmed") {
    assert(extract("plain words only") === "plain words only")
    assert(extract("") === "")
  }
}
