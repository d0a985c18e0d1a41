package graft.text

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupData

class SpanDedupSpec extends SparkSpec {

  private lazy val corpus = DedupData.withPlantedDups(table("documents"))
  private lazy val spans =
    SpanDedup.duplicateSpans(corpus, col("doc_id"), col("text")).collect()
  private lazy val stats =
    SpanDedup.spanStats(corpus, col("doc_id"), col("text")).collect()

  test("planted exact copies are covered by one whole-document span") {
    import spark.implicits._
    val nTokens = corpus
      .select(col("doc_id"),
        size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    val exactIds = corpus.filter(
        col("doc_id") >= DedupData.ExactIdOffset &&
        col("doc_id") < DedupData.NearIdOffset)
      .select("doc_id").as[Long].collect()
    assert(exactIds.nonEmpty)
    val byDoc = spans.groupBy(_.getLong(0))
    exactIds.foreach { id =>
      val ss = byDoc.getOrElse(id, Array.empty[Row])
      assert(ss.length == 1, s"copy $id should be one merged span")
      assert(ss.head.getLong(1) == 0L && ss.head.getLong(2) == nTokens(id),
        s"copy $id span should cover [0, n_tokens)")
    }
  }

  test("near copies' spans start at token 0 (shared prefix is the duplicate)") {
    val nearSpans = spans.filter(_.getLong(0) >= DedupData.NearIdOffset)
    assert(nearSpans.nonEmpty)
    val firstByDoc = nearSpans.groupBy(_.getLong(0))
      .map { case (_, ss) => ss.minBy(_.getLong(1)) }
    firstByDoc.foreach(r => assert(r.getLong(1) == 0L,
      s"near copy ${r.getLong(0)} first span should start at 0"))
  }

  test("spans are maximal: disjoint, non-touching, sorted, positive") {
    spans.groupBy(_.getLong(0)).foreach { case (id, ss) =>
      val sorted = ss.sortBy(_.getLong(1))
      sorted.foreach { r =>
        assert(r.getLong(3) == r.getLong(2) - r.getLong(1) && r.getLong(3) > 0)
      }
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getLong(1) > a.getLong(2),
            s"doc $id: spans [${a.getLong(1)},${a.getLong(2)}) and " +
              s"[${b.getLong(1)},${b.getLong(2)}) should have merged")
        case _ =>
      }
    }
  }

  test("stats ledger is complete and consistent with the span dump") {
    val dupByDoc = spans.groupBy(_.getLong(0))
      .view.mapValues(ss => (ss.map(_.getLong(3)).sum, ss.length.toLong)).toMap
    val docsWithSpans = stats.filter(_.getLong(2) > 0).map(_.getLong(0)).toSet
    assert(docsWithSpans == dupByDoc.keySet)
    stats.foreach { r =>
      val (dup, n) = dupByDoc.getOrElse(r.getLong(0), (0L, 0L))
      assert(r.getLong(2) == dup && r.getLong(3) == n)
      assert(r.getLong(4) == r.getLong(1) - r.getLong(2),
        "kept_tokens must be n_tokens - dup_tokens")
      assert(r.getLong(2) <= r.getLong(1), "cannot excise more than the doc")
    }
    // the ledger covers every non-empty doc exactly once
    assert(stats.map(_.getLong(0)).distinct.length == stats.length)
  }

  test("exciseSpans cuts exactly the spanned tokens; exact copies come back empty") {
    import spark.implicits._
    val excised = SpanDedup.exciseSpans(corpus, col("doc_id"), col("text"))
      .as[(Long, String, Long)].collect()
    val statsByDoc = stats.map(r => r.getLong(0) -> (r.getLong(1), r.getLong(4))).toMap
    excised.foreach { case (id, clean, nKept) =>
      val (nTokens, keptLedger) = statsByDoc(id)
      assert(nKept === keptLedger, s"doc $id: excision and ledger disagree")
      val words = if (clean.isEmpty) 0L else clean.split(" ").length.toLong
      assert(words === nKept, s"doc $id: clean_text token count mismatch")
      assert(nKept <= nTokens)
    }
    // planted exact copies are fully duplicated → empty after excision
    val exactIds = excised.filter(r =>
      r._1 >= DedupData.ExactIdOffset && r._1 < DedupData.NearIdOffset)
    assert(exactIds.nonEmpty && exactIds.forall(_._2.isEmpty))
  }

  test("first occurrence survives: originals of exact pairs keep uncovered text") {
    // an original whose only duplication is its planted copy must NOT be
    // fully covered (the copy is, the original keeps its canonical text) —
    // check at least one original with spans strictly smaller than n_tokens
    val origs = stats.filter(r => r.getLong(0) < DedupData.ExactIdOffset)
    assert(origs.exists(r => r.getLong(4) > 0),
      "some original must keep tokens after excision")
  }

  test("spanStatsFrom / exciseSpansFrom over a staged span frame equal the fused paths") {
    // r19: q_span_stats / q_span_excise consume the per-sf-dir staged
    // span artifact; pin that the From-variants given duplicateSpans'
    // own frame (round-tripped through parquet, as the stager does)
    // reproduce the fused outputs cell for cell.
    val dir = java.nio.file.Files.createTempDirectory("graft-span-pin").toString
    SpanDedup.duplicateSpans(corpus, col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)
    val statsFused = SpanDedup.spanStats(corpus, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    val statsStaged = SpanDedup.spanStatsFrom(corpus, col("doc_id"), col("text"), staged)
      .collect().map(_.toSeq).toSet
    assert(statsStaged === statsFused)
    val cutFused = SpanDedup.exciseSpans(corpus, col("doc_id"), col("text"))
      .collect().map(_.toSeq).toSet
    val cutStaged = SpanDedup.exciseSpansFrom(corpus, col("doc_id"), col("text"), staged)
      .collect().map(_.toSeq).toSet
    assert(cutStaged === cutFused)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    graft.CachePool.releaseAll()
  }
}
