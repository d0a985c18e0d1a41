package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4 rule flags (Raffel et al. 2020 §2.2, doc-level) and the eval-side
  * contamination leak report. Each rule gets a fixture that fails it
  * alone, so the conjunction's structure is pinned per-flag.
  */
class C4FiltersSpec extends SparkSpec {
  import spark.implicits._

  private val clean = "the quick brown fox jumps over the lazy dog."

  test("C4Filters.flags: each rule fails on exactly its planted breaker") {
    val df = Seq(
      (1L, clean),                                        // passes all
      (2L, "too short."),                                 // < 5 words
      (3L, "this sentence simply never terminates here"), // no terminal punct
      (4L, clean + " some { braces } appear."),           // brace
      (5L, clean + " Lorem Ipsum dolor sit amet."),       // lorem (case-insensitive)
      (6L, clean + " please enable JavaScript to view."), // javascript token
      (7L, clean + " " + "x" * 51 + " tail.")             // 51-char token
    ).toDF("doc_id", "text")
    val got = C4Filters.flags(df, col("doc_id"), col("text"))
      .select("doc_id", "f_min_words", "f_terminal_punct", "f_no_brace",
        "f_no_lorem", "f_no_script", "f_word_len", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().toList
    assert(got === List(
      (1L, true, true, true, true, true, true, true),
      (2L, false, true, true, true, true, true, false),
      (3L, true, false, true, true, true, true, false),
      (4L, true, true, false, true, true, true, false),
      (5L, true, true, true, false, true, true, false),
      (6L, true, true, true, true, false, true, false),
      (7L, true, true, true, true, true, false, false)))
  }

  test("flags: javascript matches as a whole word only; quote endings pass") {
    val df = Seq(
      (1L, "he said the code was readable and quite javascripty today okay."),
      (2L, "she finished the long story with a flourish and a \"quote\"")
    ).toDF("doc_id", "text")
    val got = C4Filters.flags(df, col("doc_id"), col("text"))
      .select("doc_id", "f_no_script", "f_terminal_punct", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toList
    assert(got === List((1L, true, true, true), (2L, true, true, true)))
  }

  test("flags: empty and whitespace-only text fails min-words, word-len vacuously true") {
    val df = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val got = C4Filters.flags(df, col("doc_id"), col("text"))
      .select("doc_id", "f_min_words", "f_word_len", "keep")
      .as[(Long, Boolean, Boolean, Boolean)].collect().toList
    assert(got === List((1L, false, true, false), (2L, false, true, false)))
  }

  test("flags is a stateless projection: no shuffle before the output sort") {
    val df = Seq((1L, clean)).toDF("doc_id", "text")
    val plan = C4Filters.flags(df, col("doc_id"), col("text"))
      .queryExecution.executedPlan.toString
    // exactly the output-ordering exchange, nothing aggregate/join-shaped
    assert(!plan.contains("HashAggregate") && !plan.contains("Join"), plan)
  }

  test("Decontaminate.leakReport: per-eval-doc hit counts, clean docs zero-filled") {
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (200L, "one two three four five six seven eight nine")
    ).toDF("doc_id", "text")
    val corpus = Seq(
      // both 8-gram windows of eval 100
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota extra"),
      // first window of eval 100 only
      (2L, "alpha beta gamma delta epsilon zeta eta theta unrelated tail"),
      (3L, "completely unrelated text with eight distinct words plus more")
    ).toDF("doc_id", "text")
    val got = Decontaminate.leakReport(corpus, evalDocs, col("doc_id"), col("text"), n = 8)
      .as[(Long, Long, Long)].collect().toList
    // eval 100: docs {1,2} hit it over grams {w1, w2} → (2, 2); eval 200: clean → (0, 0)
    assert(got === List((100L, 2L, 2L), (200L, 0L, 0L)))
  }

  test("leakReport and overlaps agree on total (doc, eval) hit pairs") {
    val docs = table("documents").select("doc_id", "text").limit(200)
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      .unionByName(evalDocs.select((col("doc_id") + 500000L).as("doc_id"), col("text")))
    val byCorpus = Decontaminate.overlaps(corpus, evalDocs, col("doc_id"), col("text"))
      .agg(sum("n_eval_docs")).as[Long].collect()(0)
    val byEval = Decontaminate.leakReport(corpus, evalDocs, col("doc_id"), col("text"))
      .agg(sum("n_corpus_docs")).as[Long].collect()(0)
    assert(byCorpus === byEval && byCorpus > 0)
  }
}
