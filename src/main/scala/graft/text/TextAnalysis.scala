package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: language ID, quality scoring,
  * token counting. All pure column expressions — fully codegen'd, no UDFs,
  * evaluated inside the scan stage.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens, empties dropped. */
  def tokens(text: Column): Column =
    filter(split(lower(trim(text)), "\\s+"), t => length(t) > 0)

  /** Marker stopwords per language (tiny closed-class lists — the classic
    * n-gram/stopword heuristic; weights are occurrence counts).
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "is", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "est"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "不")
  )

  /** Occurrence count of `markers` among the tokens. */
  def markerScore(toks: Column, markers: Seq[String]): Column = {
    val markerArr = array(markers.map(lit): _*)
    size(filter(toks, t => array_contains(markerArr, t)))
  }

  /** doc → per-language marker scores + argmax prediction. Ties break in
    * [[Markers]] order (en > es > de > fr > zh) — mirrored in the oracle SQL.
    *
    * The token array is materialized into ONE column first and all five
    * language scores read that attribute: interpreted higher-order
    * functions do no common-subexpression elimination, so scoring five
    * languages directly off `tokens(text)` re-runs the tokenizer five
    * times per row. CollapseProject keeps the two projections separate
    * (a non-cheap alias referenced five times is never inlined), so the
    * split/lower/trim pipeline runs exactly once per document.
    */
  def langId(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val withToks = docs.select(id.as("doc_id"), tokens(text).as("__li_tk"))
    val withScores = withToks.select(
      col("doc_id") +:
        Markers.map { case (lang, words) => markerScore(col("__li_tk"), words).as(s"score_$lang") }: _*)
    val langs = Markers.map(_._1)
    val predicted = langs.init.zipWithIndex.foldRight(lit(langs.last): Column) {
      case ((lang, i), elseCol) =>
        val rest = langs.drop(i + 1)
        val isMax = rest.map(o => col(s"score_$lang") >= col(s"score_$o")).reduce(_ && _)
        when(isMax, lit(lang)).otherwise(elseCol)
    }
    withScores.withColumn("predicted_lang", predicted).orderBy("doc_id")
  }

  /** Attach the raw quality-feature counts (single source for both
    * [[qualityScore]] and [[graft.text.DocPipeline]] — the score weights
    * must never drift between them).
    */
  def withQualityFeatures(df: DataFrame, text: Column): DataFrame =
    df
      // one materialized token column; n_tokens and n_stop read the
      // attribute (see langId — HOFs re-evaluate inlined tokenizers).
      .withColumn("__qf_tk", tokens(text))
      .withColumn("n_chars_c", length(text))
      .withColumn("n_tokens", size(col("__qf_tk")))
      .withColumn("n_alpha", length(regexp_replace(text, "[^A-Za-z]", "")))
      .withColumn("n_punct", length(regexp_replace(text, "[A-Za-z0-9\\s]", "")))
      .withColumn("n_stop", markerScore(col("__qf_tk"), Markers.head._2))
      .drop("__qf_tk")

  /** Linear quality score over the [[withQualityFeatures]] columns. Fixed-
    * order IEEE double arithmetic — oracle-stable and bitwise identical
    * however the ratios are (or are not) materialized alongside.
    */
  def qualityScoreExpr: Column =
    (col("n_stop").cast("double") / col("n_tokens")) * 2.0 +
      (col("n_alpha").cast("double") / col("n_chars_c")) -
      (col("n_punct").cast("double") / col("n_chars_c")) * 3.0 +
      when(col("n_tokens").between(20, 200), 0.5).otherwise(0.0)

  /** Quality features + linear score: stopword ratio, alpha ratio,
    * punctuation ratio, token count band. Exact integer counts; ratios and
    * the score are fixed-order IEEE double arithmetic (oracle-stable).
    */
  def qualityScore(docs: DataFrame, id: Column, text: Column): DataFrame =
    withQualityFeatures(docs.select(id.as("doc_id"), text.as("__qs_text")), col("__qs_text"))
      .withColumn("quality_score", qualityScoreExpr)
      .select(
        col("doc_id"), col("n_tokens"),
        (col("n_stop").cast("double") / col("n_tokens")).as("stop_ratio"),
        (col("n_alpha").cast("double") / col("n_chars_c")).as("alpha_ratio"),
        (col("n_punct").cast("double") / col("n_chars_c")).as("punct_ratio"),
        col("quality_score"))
      .orderBy("doc_id")

  /** BPE-ish token regex: letter runs, digit runs, single punctuation. */
  val BpeishPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

  /** Whitespace tokens, regex (BPE-ish) tokens, and the chars/4 estimate. */
  def tokenCounts(docs: DataFrame, id: Column, text: Column): DataFrame =
    docs.select(
      id.as("doc_id"),
      size(tokens(text)).as("ws_tokens"),
      regexp_count(text, lit(BpeishPattern)).as("re_tokens"),
      floor((length(text) + lit(3)) / lit(4)).cast("long").as("est_bpe_tokens"))
      .orderBy("doc_id")
}
