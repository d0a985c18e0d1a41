package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.analytics.Stats
import graft.dedup.BloomDedup

/** The round-5 curation operators: NDV sketch certificate, the filter
  * funnel, chunk-level corpus dedup, and Bloom incremental dedup.
  * Hand-computable fixtures pin exact semantics; the DuckDB oracles pin
  * them again at sf scale.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("ndvSketch: exact counts per group, certificate holds") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 10L), ("b", 10L), ("b", 10L)
    ).toDF("k", "v")
    val got = Stats.ndvSketch(df, col("k"), col("v"))
      .as[(String, Long, Long, Boolean)].collect().toList
    assert(got === List(("a", 4L, 3L, true), ("b", 3L, 1L, true)))
  }

  test("ndvSketch certificate survives a high-cardinality group") {
    val df = spark.range(100000).select(lit("g").as("k"), col("id").as("v"))
    val row = Stats.ndvSketch(df, col("k"), col("v")).collect()(0)
    assert(row.getAs[Long]("n_rows") === 100000L)
    assert(row.getAs[Long]("ndv_exact") === 100000L)
    assert(row.getAs[Boolean]("ndv_ok"))
  }

  test("filterFunnel counts each stage exactly") {
    // eval set contributes the 8-gram of doc 4's text.
    val evalDocs = Seq(
      (100L, "held out benchmark prompt with eight exact tokens")).toDF("doc_id", "text")
    val grams = Decontaminate.evalGramHashes(evalDocs, col("doc_id"), col("text"))
    val docs = Seq(
      // quality-fail: too short (< 5 tokens)
      (1L, "s0", "too short text"),
      // quality-pass, clean, unique
      (2L, "s0", "a perfectly ordinary document with enough tokens"),
      // exact duplicate of doc 2 modulo case/whitespace → dedup collapses
      (3L, "s0", "  A Perfectly Ordinary   Document With Enough Tokens "),
      // contaminated: contains the eval 8-gram verbatim
      (4L, "s1", "prefix held out benchmark prompt with eight exact tokens suffix"),
      // quality-pass, clean, unique — second source
      (5L, "s1", "another clean document that sails through every gate")
    ).toDF("doc_id", "source", "text")
    val got = DocPipeline.filterFunnel(
        docs, col("doc_id"), col("text"), col("source"), grams, quotaK = 1)
      .as[(Long, String, Long)].collect().toList
    // raw 5 → quality 4 (doc 1 drops) → decontaminate 3 (doc 4 drops)
    // → dedup 2 (docs 2/3 collapse) → quota 2 (one survivor per source).
    assert(got === List(
      (0L, "raw", 5L), (1L, "quality", 4L), (2L, "decontaminate", 3L),
      (3L, "dedup", 2L), (4L, "quota", 2L)))
  }

  test("filterFunnel quota stage caps per-source survivors") {
    val docs = Seq(
      (1L, "s0", "first clean unique document with plenty of tokens"),
      (2L, "s0", "second clean unique document with plenty of tokens"),
      (3L, "s0", "third clean unique document with plenty of tokens"),
      (4L, "s1", "fourth clean unique document with plenty of tokens")
    ).toDF("doc_id", "source", "text")
    val rows = DocPipeline.filterFunnel(
        docs, col("doc_id"), col("text"), col("source"), Array.empty[Long], quotaK = 2)
      .as[(Long, String, Long)].collect().toList
    assert(rows.map(_._3) === List(4L, 4L, 4L, 4L, 3L)) // quota: min(2,3)+min(2,1)
  }

  test("dedupChunks drops corpus-duplicated chunks, keeps order") {
    val docs = Seq(
      (1L, "a b c d e f"),     // chunks (w=3): "a b c", "d e f"
      (2L, "a b c x y z"),     // shares "a b c" with doc 1
      (3L, "p q r")            // unique single chunk
    ).toDF("doc_id", "text")
    val got = ChunkDedup.dedupChunks(docs, col("doc_id"), col("text"), w = 3, maxDf = 1L)
      .as[(Long, Int, Long, String)].collect().toList
    assert(got === List(
      (1L, 2, 1L, "d e f"),
      (2L, 2, 1L, "x y z"),
      (3L, 1, 1L, "p q r")))
  }

  test("dedupChunks: exact copies erase each other; empty docs survive as rows") {
    val docs = Seq(
      (1L, "one two three four"),
      (2L, "  One Two   THREE four "),  // normalizes to doc 1's chunk stream
      (3L, "")
    ).toDF("doc_id", "text")
    val got = ChunkDedup.dedupChunks(docs, col("doc_id"), col("text"), w = 4, maxDf = 1L)
      .as[(Long, Int, Long, String)].collect().toList
    assert(got === List(
      (1L, 1, 0L, ""),
      (2L, 1, 0L, ""),
      (3L, 0, 0L, "")))
  }

  test("dedupChunks partial last chunk dedups like any other") {
    val docs = Seq(
      (1L, "a b c tail"),   // chunks (w=3): "a b c", "tail"
      (2L, "x y z tail")    // "x y z", "tail" — the short chunk is shared
    ).toDF("doc_id", "text")
    val got = ChunkDedup.dedupChunks(docs, col("doc_id"), col("text"), w = 3, maxDf = 1L)
      .as[(Long, Int, Long, String)].collect().toList
    assert(got === List((1L, 2, 1L, "a b c"), (2L, 2, 1L, "x y z")))
  }

  test("OovRate counts occurrence-level OOV at unigram and bigram level") {
    val ref = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "alpha beta beta junk"),
      (2L, ""),
      (3L, "gamma")
    ).toDF("doc_id", "text")
    val got = OovRate.oovStats(corpus, ref, col("doc_id"), col("text"))
      .as[(Long, Int, Long, Long, Long, Long)].collect().toList
    assert(got === List(
      // unigrams: alpha beta beta junk → 1 OOV (junk);
      // bigrams: "alpha beta" ∈ V, "beta beta" ∉, "beta junk" ∉ → 2 OOV
      (1L, 4, 4L, 1L, 3L, 2L),
      // empty doc: one whole-text gram ('' / hash 0) at each level, both OOV
      (2L, 0, 1L, 1L, 1L, 1L),
      // "gamma": unigram in vocab; its 1-token whole-text BIGRAM is not
      // (the ref has no 1-token docs)
      (3L, 1, 1L, 0L, 1L, 1L)))
  }

  test("OovRate: planted junk suffix scores OOV against the clean half") {
    val docs = table("documents")
    val planted = graft.dedup.DedupData.withPlantedDups(docs)
    val stats = OovRate.oovStats(
      planted, docs.filter(col("doc_id") % 2 === 0), col("doc_id"), col("text"))
    // near-dup copies carry " zz extra trailing tokens appended" — 'zz'
    // at least is outside the corpus vocabulary
    val nearOov = stats.filter(col("doc_id") >= 2000000L && col("n_oov_uni") > 0).count()
    val nearAll = stats.filter(col("doc_id") >= 2000000L).count()
    assert(nearAll > 0 && nearOov === nearAll,
      s"every planted near-dup must show unigram OOV: $nearOov of $nearAll")
    // clean even docs score zero unigram OOV (their tokens ARE the vocab)
    assert(stats.filter(col("doc_id") < 1000000L && col("doc_id") % 2 === 0)
      .filter(col("n_oov_uni") > 0).count() === 0)
  }

  test("BloomDedup.incrementalStats: exact integers, no false negatives") {
    val snapshot = Seq(
      (1L, "alpha document text"), (2L, "beta document text"),
      (3L, "gamma document text")).toDF("doc_id", "text")
    val batch = Seq(
      (11L, "  ALPHA Document   Text "), // true dup of 1 after normalize
      (12L, "beta document text"),       // true dup of 2
      (13L, "entirely new document")     // passes
    ).toDF("doc_id", "text")
    val row = BloomDedup.incrementalStats(
      snapshot, batch, col("doc_id"), col("text"), expectedItems = 100L).collect()(0)
    assert(row.getAs[Long]("n_snapshot") === 3L)
    assert(row.getAs[Long]("n_batch") === 3L)
    assert(row.getAs[Long]("n_true_dup") === 2L)
    assert(row.getAs[Long]("n_pass") === 1L)
    assert(row.getAs[Boolean]("fp_ok"))
  }

  test("BloomDedup.newDocs returns exactly the non-duplicate batch rows") {
    val snapshot = table("documents").select(col("doc_id"), col("text"))
    // batch: 20 verbatim re-crawls (all dups) + 20 fresh variants
    val dups = snapshot.filter(col("doc_id") < 20)
      .select((col("doc_id") + 9000L).as("doc_id"), col("text"))
    val fresh = snapshot.filter(col("doc_id") >= 20 && col("doc_id") < 40)
      .select((col("doc_id") + 9100L).as("doc_id"),
        concat(col("text"), lit(" fresh suffix")).as("text"))
    val batch = dups.unionByName(fresh)
    val kept = BloomDedup.newDocs(
        snapshot, batch, col("doc_id"), col("text"), expectedItems = 1000L)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === (9120L until 9140L).toSet)
  }

  test("BloomDedup.mightContain has no false negatives on a planted set") {
    val snapshot = spark.range(1000).select(col("id").as("doc_id"),
      concat(lit("snapshot doc "), col("id")).as("text"))
    val bf = BloomDedup.buildFilter(snapshot, col("text"), expectedItems = 1000L)
    val misses = snapshot
      .filter(!BloomDedup.mightContain(bf, BloomDedup.normHash(col("text"))))
      .count()
    assert(misses === 0L)
  }

  test("Dsir.logRatioScores ranks target-like docs above off-distribution docs") {
    import graft.text.Dsir
    val target = Seq(
      (100L, "alpha beta alpha beta"),
      (101L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"),
      (2L, "zzz qqq xxx"),
      (3L, "alpha zzz")).toDF("doc_id", "text")
    val got = Dsir.logRatioScores(raw, target, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> r._3).toMap
    // pure target grams > mixed > pure junk, and junk scores negative
    assert(got(1L) > got(3L) && got(3L) > got(2L), s"got $got")
    assert(got(2L) < 0.0)
    graft.CachePool.releaseAll()
  }

  test("Dsir: target-like docs selected by majority vote, off-distribution docs not") {
    import graft.text.Dsir
    val target = Seq(
      (100L, "alpha beta alpha beta"),
      (101L, "alpha beta gamma")).toDF("doc_id", "text")
    val raw = Seq(
      (1L, "alpha beta alpha"),    // all grams in target buckets
      (2L, "zzz qqq xxx"),         // none
      (3L, "alpha zzz")            // uni: alpha hot, zzz not; bigram not: 1/3 < half
    ).toDF("doc_id", "text")
    val got = Dsir.importanceStats(raw, target, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // doc 1: 3 unigrams + 2 bigrams = 5 grams, all in target-hot buckets
    assert(got(1L) === ((5L, 5L, true)))
    assert(got(2L) === ((5L, 0L, false)))
    assert(got(3L) === ((3L, 1L, false)))
    graft.CachePool.releaseAll()
  }

  test("keyset pages tile the ranking: disjoint, ordered, = rank-window slices") {
    import org.apache.spark.sql.expressions.Window
    // synthetic scored frame with quality ties (tie-break on doc_id)
    val scored = (1L to 23L).map(i => (i, s"s${i % 2}", (i % 5).toDouble))
      .toDF("doc_id", "source", "quality_score")
    val p1 = DocPipeline.pageByQuality(scored, 4)
    val p2 = DocPipeline.pageByQuality(scored, 4, Some(DocPipeline.pageCursors(p1)))
    val p3 = DocPipeline.pageByQuality(scored, 4,
      Some(DocPipeline.pageCursors(p2)))
    val pages = Seq(p1, p2, p3).map(
      _.select("source", "doc_id").as[(String, Long)].collect().toSet)
    assert(pages(0).intersect(pages(1)).isEmpty &&
      pages(1).intersect(pages(2)).isEmpty && pages(0).intersect(pages(2)).isEmpty)
    // each page equals the corresponding rank-window slice
    val w = Window.partitionBy("source")
      .orderBy(col("quality_score").desc, col("doc_id"))
    val ranked = scored.withColumn("rk", row_number().over(w))
    pages.zipWithIndex.foreach { case (page, i) =>
      val slice = ranked.filter(col("rk").between(i * 4 + 1, (i + 1) * 4))
        .select("source", "doc_id").as[(String, Long)].collect().toSet
      assert(page === slice, s"page ${i + 1} diverged from the rank slice")
    }
  }
}
