package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII redaction for training corpora: URLs, e-mail addresses, phone
  * numbers and IPv4 literals are replaced with typed placeholder tokens,
  * with per-category match counts kept as quality-audit columns.
  *
  * Deliberately sequential: each category counts and redacts on the
  * OUTPUT of the previous stage (a URL's embedded credentials must not
  * also count as an e-mail), so counts are disjoint and the final text
  * deterministic. Patterns stay in the regex subset where Java's engine
  * and RE2 agree, which is what makes the operator oracle-checkable — a
  * DuckDB pipeline over the same pattern chain reproduces text and
  * counts byte-for-byte.
  *
  * Everything is codegen'd `regexp_replace`/`regexp_count` over one
  * projection — no UDF, no shuffle, scales as a pure map.
  */
object Redact {

  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  /** International-prefix form only (leading +): bare digit runs are too
    * ambiguous to scrub safely.
    */
  val PhoneRe = "\\+[0-9][0-9()\\- ]{7,}[0-9]"
  val IpRe = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** The redaction chain as (pattern, placeholder), applied in order. */
  val Stages: Seq[(String, String)] = Seq(
    UrlRe -> "<URL>", EmailRe -> "<EMAIL>", PhoneRe -> "<PHONE>", IpRe -> "<IP>")

  /** (redacted text, per-stage match counts) over one projection. */
  def redactWithCounts(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val stage0 = docs.select(id.as("doc_id"), text.as("__t0"))
    val (result, _) = Stages.zipWithIndex.foldLeft((stage0, "__t0")) {
      case ((df, prev), ((re, token), i)) =>
        val cur = s"__t${i + 1}"
        val cnt = "n_" + token.stripPrefix("<").stripSuffix(">").toLowerCase + "s"
        (df.withColumn(cnt, regexp_count(col(prev), lit(re)))
           .withColumn(cur, regexp_replace(col(prev), re, token)), cur)
    }
    result.select(col("doc_id"), col(s"__t${Stages.size}").as("text_redacted"),
      col("n_urls"), col("n_emails"), col("n_phones"), col("n_ips"))
  }
}
