package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TF-IDF, repetition, decontamination, sequence packing — the round-4
  * corpus-prep operators. Hand-computable fixtures pin exact semantics;
  * the DuckDB oracles pin them again at sf scale.
  */
class CorpusPrepSpec extends SparkSpec {
  import spark.implicits._

  test("TfIdf.topTerms ranks by tf·N/df with term tie-break") {
    val df = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry"),
      (3L, "cherry cherry cherry date")
    ).toDF("doc_id", "text")
    val got = TfIdf.topTerms(df, col("doc_id"), col("text"), k = 2)
      .select("doc_id", "term", "tf", "df", "tfidf")
      .as[(Long, String, Long, Long, Double)].collect().toList
    // N=3. doc1: apple tf=2 df=1 → 6.0; banana tf=1 df=2 → 1.5
    // doc2: cherry tf=1 df=2 → 1.5; banana tf=1 df=2 → 1.5 (tie → banana first)
    // doc3: cherry tf=3 df=2 → 4.5; date tf=1 df=1 → 3.0
    assert(got === List(
      (1L, "apple", 2L, 1L, 6.0), (1L, "banana", 1L, 2L, 1.5),
      (2L, "banana", 1L, 2L, 1.5), (2L, "cherry", 1L, 2L, 1.5),
      (3L, "cherry", 3L, 2L, 4.5), (3L, "date", 1L, 1L, 3.0)))
  }

  test("TfIdf.mergeDocumentFrequencies: snapshot + delta sums equal the batch df") {
    val base = Seq((1L, "apple apple banana"), (2L, "banana cherry")).toDF("doc_id", "text")
    val delta = Seq((3L, "cherry cherry cherry date")).toDF("doc_id", "text")
    val merged = TfIdf.mergeDocumentFrequencies(
        TfIdf.documentFrequencies(base, col("text")),
        TfIdf.documentFrequencies(delta, col("text")))
      .as[(String, Long)].collect().toMap
    val batch = TfIdf.documentFrequencies(base.unionByName(delta), col("text"))
      .as[(String, Long)].collect().toMap
    assert(merged === batch)
    assert(merged === Map("apple" -> 1L, "banana" -> 2L, "cherry" -> 2L, "date" -> 1L))
  }

  test("TfIdf.topTermsIncremental is bit-identical to the batch topTerms") {
    val base = Seq(
      (1L, "apple apple banana"),
      (2L, "banana cherry")).toDF("doc_id", "text")
    val delta = Seq(
      (3L, "cherry cherry cherry date"),
      (4L, "date apple elder")).toDF("doc_id", "text")
    val inc = TfIdf.topTermsIncremental(base, delta, col("doc_id"), col("text"), k = 2)
      .as[(Long, String, Long, Long, Double)].collect().toList
    val batch = TfIdf.topTerms(base.unionByName(delta), col("doc_id"), col("text"), k = 2)
      .as[(Long, String, Long, Long, Double)].collect().toList
    graft.CachePool.releaseAll()
    assert(inc === batch)
  }

  test("repetitionStats counts occurrences of repeated positional 2-grams") {
    val df = Seq(
      (1L, "a b a b a"),   // 2-grams: ab ba ab ba → every occurrence repeated
      (2L, "a b c d"),     // ab bc cd → all unique
      (3L, "x")            // short doc → one whole-text gram
    ).toDF("doc_id", "text")
    val got = Repetition.repetitionStats(df, col("doc_id"), col("text"), n = 2)
      .select("doc_id", "n_grams", "n_rep", "max_gram_count", "rep_ratio")
      .as[(Long, Long, Long, Long, Double)].collect().toList
    assert(got === List(
      (1L, 4L, 4L, 2L, 1.0),
      (2L, 3L, 0L, 1L, 0.0),
      (3L, 1L, 0L, 1L, 0.0)))
  }

  test("repetitionStats: a doubled document is near-fully repeated") {
    val text = "one two three four five six seven eight nine ten"
    val df = Seq((1L, text + " " + text)).toDF("doc_id", "text")
    val r = Repetition.repetitionStats(df, col("doc_id"), col("text"), n = 2)
      .collect()(0)
    // 20 tokens → 19 positional 2-grams; only "ten one" (the seam) is
    // unique, the other 18 occurrences are 9 grams seen twice.
    assert(r.getAs[Long]("n_grams") === 19L)
    assert(r.getAs[Long]("n_rep") === 18L)
    assert(r.getAs[Double]("rep_ratio") === 18.0 / 19)
  }

  test("NgramLm.scoreStats: bit-length log-likelihood computed by hand") {
    val ref = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    // ref bigrams: doc1 → ab, ba, ab; doc2 (len 2 → one window) → ab
    // counts: ab=3, ba=1
    val corpus = Seq(
      (10L, "a b a c"), // ab(c=3→2 bits), ba(c=1→1 bit), ac(unseen→0)
      (11L, "x")        // short doc → one whole-text gram, unseen
    ).toDF("doc_id", "text")
    val got = NgramLm.scoreStats(corpus, ref, col("doc_id"), col("text"))
      .select("doc_id", "n_tokens", "n_grams", "n_seen", "lp2")
      .as[(Long, Int, Long, Long, Long)].collect().toList
    assert(got === List((10L, 4, 3L, 2L, 3L), (11L, 1, 1L, 0L, 0L)))
  }

  test("NgramLm: a junk-suffixed copy ranks strictly below its original by mean bits") {
    val base = "the quick brown fox jumps over the lazy dog near the river bank today"
    val ref = Seq((1L, base), (2L, base + " and yesterday")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, base),
      (11L, base + " zxq wvv qqj zxq wvv")).toDF("doc_id", "text")
    val got = NgramLm.scoreStats(corpus, ref, col("doc_id"), col("text"))
      .select("doc_id", "n_grams", "lp2").as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val (ngO, lpO) = got(10L)
    val (ngC, lpC) = got(11L)
    // integer cross-multiply: lp2/n_grams strictly larger for the original
    assert(lpO * ngC > lpC * ngO, s"got $got")
  }

  test("Decontaminate.overlaps flags only docs sharing an 8-gram with the eval set") {
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota")).toDF("doc_id", "text")
    val corpus = Seq(
      // contains eval 8-gram window (first 8 tokens, and 2nd window)
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota extra"),
      // no shared 8-gram (only 5 shared tokens in a row)
      (2L, "alpha beta gamma delta epsilon other words here padding tail"),
      (3L, "completely unrelated text with eight distinct words plus more")
    ).toDF("doc_id", "text")
    val got = Decontaminate.overlaps(corpus, evalDocs, col("doc_id"), col("text"), n = 8)
      .select("doc_id", "n_hit_grams", "n_eval_docs")
      .as[(Long, Long, Long)].collect().toList
    // eval doc has 9 tokens → two 8-gram windows; doc 1 contains both.
    assert(got === List((1L, 2L, 1L)))
  }

  test("overlapSweep: flagged set non-increasing in k; the k=8 row matches overlaps") {
    val docs = table("documents")
    val evalDocs = docs.filter(col("doc_id") % 10 === 0)
    val corpus = graft.dedup.DedupData.withPlantedDups(docs)
      .filter(!(col("doc_id") < graft.dedup.DedupData.ExactIdOffset &&
        col("doc_id") % 10 === 0))
    val sweep = Decontaminate.overlapSweep(corpus, evalDocs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long)].collect().toList
    assert(sweep.map(_._1) === List(8L, 13L, 25L, 50L))
    // a verbatim k-window match implies matches at every smaller k, so
    // the flagged set can only shrink as the window grows
    val flagged = sweep.map(_._2)
    assert(flagged === flagged.sorted.reverse, s"not non-increasing: $sweep")
    assert(flagged.head ===
      Decontaminate.overlaps(corpus, evalDocs, col("doc_id"), col("text"), n = 8).count())
  }

  test("overlaps falls back to a shuffle join above maxBroadcastRows, rows unchanged") {
    val docs = table("documents")
    val evalDocs = docs.filter(col("doc_id") % 13 === 0)
      .select(col("doc_id") + 100000L as "doc_id", col("text"))
    val viaBroadcast = Decontaminate.overlaps(docs, evalDocs, col("doc_id"), col("text"))
    val viaShuffle = Decontaminate.overlaps(docs, evalDocs, col("doc_id"), col("text"),
      maxBroadcastRows = 1L)
    // the guard switches the JOIN STRATEGY hint, not the answer
    assert(viaBroadcast.queryExecution.optimizedPlan.toString.contains("strategy=broadcast"))
    assert(viaShuffle.queryExecution.optimizedPlan.toString.contains("strategy=shuffle_hash"))
    assert(viaShuffle.collect().toSeq === viaBroadcast.collect().toSeq)
  }

  test("overlapsNearDup flags near-paraphrase contamination the exact probe structure implies") {
    val docs = table("documents")
    // eval set: near variants (appended tokens) of every 5th doc — the
    // class exact matching catches only via surviving grams, fuzzy via
    // whole-set similarity
    val evalDocs = docs.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" zz extra trailing tokens appended")).as("text"))
    val flags = Decontaminate.overlapsNearDup(docs, evalDocs, col("doc_id"), col("text"))
      .as[(Long, Long, Double)].collect()
    // every flag is corpus-vs-eval (ids disjoint by construction: no self-pairs)
    assert(flags.forall { case (docId, evalId, _) => docId < 500000L && evalId >= 500000L })
    // recall: ≥90% of the planted originals flagged against their own variant
    val planted = docs.filter(col("doc_id") % 5 === 0).count()
    val recovered = flags.count { case (docId, evalId, _) => evalId == docId + 500000L }
    assert(recovered >= planted * 9 / 10, s"$recovered of $planted")
    // estimates carried through are genuine similarities, in (0, 1]
    assert(flags.forall { case (_, _, j) => j > 0.0 && j <= 1.0 })
  }

  test("flagContaminated probe agrees with the arrays_overlap formulation corpus-wide") {
    val docs = table("documents")
    val evalDocs = docs.filter(col("doc_id") % 13 === 0)
    val grams = Decontaminate.evalGramHashes(evalDocs, col("doc_id"), col("text"))
    val viaProbe = Decontaminate.flagContaminated(
        docs, grams, col("doc_id"), col("text"))
      .as[(Long, Boolean)].collect().toSet
    val viaOverlap = docs.select(col("doc_id"),
        arrays_overlap(graft.dedup.NGramJaccard.ngramSet(col("text"), 8),
          typedlit(grams)).as("contaminated"))
      .as[(Long, Boolean)].collect().toSet
    assert(viaProbe === viaOverlap)
    assert(viaProbe.exists(_._2)) // the eval subset itself is contaminated
  }

  test("flagContaminated is batch/stream identical (stateless map, no state)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val evalDocs = Seq(
      (100L, "alpha beta gamma delta epsilon zeta eta theta iota")).toDF("doc_id", "text")
    val grams = Decontaminate.evalGramHashes(evalDocs, col("doc_id"), col("text"))
    val corpusRows = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota extra"),
      (2L, "unrelated words that do not mention any benchmark window content"))
    val batch = Decontaminate.flagContaminated(
        corpusRows.toDF("doc_id", "text"), grams, col("doc_id"), col("text"))
      .as[(Long, Boolean)].collect().toSet
    assert(batch === Set((1L, true), (2L, false)))

    val input = MemoryStream[(Long, String)](spark)
    val q = Decontaminate.flagContaminated(
        input.toDS().toDF("doc_id", "text"), grams, col("doc_id"), col("text"))
      .writeStream.format("memory").queryName("decon_stream")
      .outputMode("append").start()
    try {
      input.addData(corpusRows: _*)
      q.processAllAvailable()
      val got = spark.table("decon_stream").as[(Long, Boolean)].collect().toSet
      assert(got === batch)
    } finally q.stop()
  }

  test("packGreedy fills bins greedily in doc order and numbers bins globally") {
    // groupSize=4 → groups {0..3}, {4..7}; budget=10
    val df = Seq(
      (0L, 4), (1L, 4), (2L, 4), (3L, 9),   // grp 0: [0,1]→bin0 (8), 2→bin0? 8+4>10 → bin1; 3→9: 4+9>10 → bin2
      (4L, 11), (5L, 1), (6L, 10), (7L, 2)  // grp 1: 4→bin3 (11, oversize alone-ish), 5→11+1>10 → bin4 (1), 6→1+10>10 → bin5, 7→10+2>10 → bin6
    ).toDF("doc_id", "n")
    val got = SeqPack.packGreedy(df, col("doc_id"), col("n"), budget = 10, groupSize = 4)
      .select("doc_id", "n_tokens", "bin_id")
      .as[(Long, Int, Long)].collect().toList
    assert(got === List(
      (0L, 4, 0L), (1L, 4, 0L), (2L, 4, 1L), (3L, 9, 2L),
      (4L, 11, 3L), (5L, 1, 4L), (6L, 10, 5L), (7L, 2, 6L)))
  }

  test("packGreedy: a bin opened by a zero-token doc accepts the next doc whatever its size") {
    // doc 0 has 0 tokens (empty/whitespace-only text), doc 1 alone exceeds
    // the budget: the fill > 0 guard keeps doc 1 in doc 0's bin instead of
    // opening a new one — the semantics the DuckDB oracle must replay
    // (its CASE arms carry the same fill > 0 guard).
    val df = Seq((0L, 0), (1L, 15), (2L, 3)).toDF("doc_id", "n")
    val got = SeqPack.packGreedy(df, col("doc_id"), col("n"), budget = 10, groupSize = 64)
      .select("doc_id", "bin_id").as[(Long, Long)].collect().toList
    assert(got === List((0L, 0L), (1L, 0L), (2L, 1L)))
  }

  test("packGreedyStable: untouched groups keep identical shard keys across a delta") {
    // same docs as the packGreedy example: grp 0 → local bins 0,0,1,2;
    // grp 1 → 0,1,2,3 — shard_key = grp*1024 + local_bin
    val df = Seq(
      (0L, 4), (1L, 4), (2L, 4), (3L, 9),
      (4L, 11), (5L, 1), (6L, 10), (7L, 2)).toDF("doc_id", "n")
    val got = SeqPack.packGreedyStable(df, col("doc_id"), col("n"),
        budget = 10, groupSize = 4)
      .as[(Long, Int, Long)].collect().toList
    assert(got === List(
      (0L, 4, 0L), (1L, 4, 0L), (2L, 4, 1L), (3L, 9, 2L),
      (4L, 11, 1024L), (5L, 1, 1025L), (6L, 10, 1026L), (7L, 2, 1027L)))
    // the stability contract: deleting a doc from grp 0 must not move a
    // single grp-1 assignment (dense global ids WOULD renumber them)
    val after = SeqPack.packGreedyStable(df.filter(col("doc_id") =!= 2L),
        col("doc_id"), col("n"), budget = 10, groupSize = 4)
      .as[(Long, Int, Long)].collect().toList
    assert(after.filter(_._1 >= 4L) === got.filter(_._1 >= 4L))
  }

  test("shardManifest: hand-checked offsets, then invariants on a random packing") {
    // assignments from the first packGreedy example (budget 10, grp 4):
    // bin0={0,1}(8t) bin1={2}(4t) bin2={3}(9t) bin3={4}(11t) bin4={5}(1t)
    // bin5={6}(10t) bin6={7}(2t); shard_len = tokens + 1/doc
    val packed = SeqPack.packGreedy(
      Seq((0L, 4), (1L, 4), (2L, 4), (3L, 9), (4L, 11), (5L, 1), (6L, 10), (7L, 2))
        .toDF("doc_id", "n"),
      col("doc_id"), col("n"), budget = 10, groupSize = 4)
    val got = SeqPack.shardManifest(packed, sepTokens = 1)
      .select("bin_id", "n_docs", "sum_tokens", "shard_len", "start_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(got === List(
      (0L, 2L, 8L, 10L, 0L), (1L, 1L, 4L, 5L, 10L), (2L, 1L, 9L, 10L, 15L),
      (3L, 1L, 11L, 12L, 25L), (4L, 1L, 1L, 2L, 37L), (5L, 1L, 10L, 11L, 39L),
      (6L, 1L, 2L, 3L, 50L)))

    // random packing: offsets are the exclusive running sum of shard_len,
    // starting at 0, and totals reconcile with the input
    val rng = new scala.util.Random(7)
    val docs = (0L until 300L).map(i => (i, rng.nextInt(120))).toDF("doc_id", "n")
    val m = SeqPack.shardManifest(
        SeqPack.packGreedy(docs, col("doc_id"), col("n"), budget = 256, groupSize = 32),
        sepTokens = 1)
      .select("bin_id", "n_docs", "sum_tokens", "shard_len", "start_offset")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(m.map(_._1) === m.map(_._1).sorted)
    var expect = 0L
    m.foreach { case (_, _, _, len, off) =>
      assert(off === expect); expect += len
    }
    assert(m.map(_._2).sum === 300L)
    assert(m.map(_._3).sum === docs.as[(Long, Int)].collect().map(_._2.toLong).sum)
  }

  test("packGreedy matches a local reference fold on random sparse-id inputs") {
    val rng = new scala.util.Random(42)
    for (round <- 0 until 3) {
      val n = 30 + rng.nextInt(40)
      val docs = (0 until n).map(i => (i.toLong * 3 + rng.nextInt(2), 1 + rng.nextInt(20)))
        .distinctBy(_._1)
      val budget = 25
      val g = 8
      val got = SeqPack.packGreedy(docs.toDF("doc_id", "n"),
          col("doc_id"), col("n"), budget, g)
        .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
      // reference: per id-range group, sequential greedy; bins numbered
      // consecutively across groups in group order
      var nextBin = 0L
      val ref = docs.sortBy(_._1).groupBy(_._1 / g).toSeq.sortBy(_._1).flatMap {
        case (_, items) =>
          var fill = 0L
          var b = nextBin
          val out = items.sortBy(_._1).map { case (id, nt) =>
            if (fill > 0 && fill + nt > budget) { b += 1; fill = nt.toLong }
            else fill += nt
            (id, b)
          }
          nextBin = b + 1
          out
      }.toMap
      assert(got === ref, s"round $round mismatch")
    }
  }

  test("sourceQuota keeps at most k docs per source, best quality first") {
    val docs = table("documents")
    val k = 2
    val quota = DocPipeline.sourceQuota(docs, col("doc_id"), col("text"), col("source"), k)
    val perSource = quota.groupBy("source").agg(count(lit(1)).as("n"))
    assert(perSource.filter(col("n") > k).count() === 0L)
    // kept docs per source are exactly the top-k by (score desc, doc_id)
    val all = DocPipeline.withQuality(
        docs.select(col("doc_id"), col("source"), col("text")), col("text"))
      .select("doc_id", "source", "quality_score")
      .as[(Long, String, Double)].collect()
    val expect = all.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      rows.sortBy(r => (-r._3, r._1)).take(k).toSeq
    }.map(r => (r._1, r._2)).toSet
    val got = quota.select("doc_id", "source").as[(Long, String)].collect().toSet
    assert(got === expect)
  }

  test("packGreedy never overfills a bin (except single oversized docs)") {
    val docs = table("documents")
    val packed = SeqPack.packGreedy(
      docs, col("doc_id"), size(TextAnalysis.tokens(col("text"))),
      budget = 512, groupSize = 64)
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
    val overfull = bins.filter(col("fill") > 512 && col("n_docs") > 1).count()
    assert(overfull === 0L)
    // every doc appears exactly once
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    // bin ids are dense from 0
    val ids = bins.select("bin_id").as[Long].collect().sorted
    assert(ids === (0L until ids.length).toArray)
  }

  test("FfdBins places largest-first into the lowest open bin with room") {
    import graft.functions.PackExprs
    // budget 10, sizes by (desc, pos): 7→b0, 6→b1, 4→b1(=10), 3→b0(=10), 2→b2
    val df = Seq(Tuple1(Seq(6, 7, 3, 4, 2))).toDF("sizes")
    val got = df.select(PackExprs.ffdBins(col("sizes"), 10).as("b"))
      .as[Seq[Long]].head()
    assert(got === Seq(1L, 0L, 0L, 1L, 2L))
    // oversized doc opens its own bin; nothing joins it
    val over = Seq(Tuple1(Seq(15, 9, 2))).toDF("sizes")
    assert(over.select(PackExprs.ffdBins(col("sizes"), 10))
      .as[Seq[Long]].head() === Seq(0L, 1L, 2L)) // 9+2 > 10 → 2 opens bin2
  }

  test("packFfd matches a local reference FFD on random inputs; invariants hold") {
    val rng = new scala.util.Random(7)
    for (round <- 0 until 3) {
      val n = 30 + rng.nextInt(40)
      val docs = (0 until n).map(i => (i.toLong * 3 + rng.nextInt(2), 1 + rng.nextInt(20)))
        .distinctBy(_._1)
      val budget = 25
      val g = 8
      val got = SeqPack.packFfd(docs.toDF("doc_id", "n"),
          col("doc_id"), col("n"), budget, g)
        .select("doc_id", "bin_id").as[(Long, Long)].collect().toMap
      graft.CachePool.releaseAll()
      // reference FFD per id-range group: size desc (id tie-break), first
      // open bin with room; bins numbered consecutively across groups
      var nextBin = 0L
      val ref = docs.groupBy(_._1 / g).toSeq.sortBy(_._1).flatMap { case (_, items) =>
        val fills = scala.collection.mutable.ArrayBuffer.empty[Long]
        val out = items.sortBy { case (id, nt) => (-nt, id) }.map { case (id, nt) =>
          val j = fills.indexWhere(_ + nt <= budget)
          val b = if (j < 0) { fills += nt.toLong; fills.length - 1 }
            else { fills(j) += nt; j }
          (id, nextBin + b)
        }
        nextBin += fills.length
        out
      }.toMap
      assert(got === ref, s"round $round mismatch")
    }
    // corpus invariants: exactly-once coverage, no multi-doc bin overfull,
    // dense ids — and FFD is never WORSE on padding than the lower bound
    val docs = table("documents")
    val packed = SeqPack.packFfd(
      docs, col("doc_id"), size(TextAnalysis.tokens(col("text"))),
      budget = 512, groupSize = 64)
    val bins = packed.groupBy("bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("n_docs"))
    assert(bins.filter(col("fill") > 512 && col("n_docs") > 1).count() === 0L)
    assert(packed.count() === docs.count())
    assert(packed.select("doc_id").distinct().count() === docs.count())
    val ids = bins.select("bin_id").as[Long].collect().sorted
    assert(ids === (0L until ids.length).toArray)
    graft.CachePool.releaseAll()
  }

  test("q_rank_assign: ranks cover the corpus; the gauge restates the emitted totals") {
    val docs = table("documents")
    val total = docs.select(sum(size(TextAnalysis.tokens(col("text")))).cast("long"))
      .as[Long].head()
    val got = graft.SparkEntry.queries("q_rank_assign")(spark, Sf)
      .select("rank", "n_bins", "rank_tokens", "imb_permille", "total_tokens")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.map(_._1).sorted === (0L until 8L), "all 8 ranks must be assigned bins")
    assert(got.map(_._3).sum === total, "rank token totals must cover the corpus")
    assert(got.head._5 === total)
    val want = got.map(_._3).max * 1000 * 8 / total
    got.foreach { r => assert(r._4 === want, "gauge must restate the emitted totals") }
  }

  test("q_epoch_plan: the allocation identity holds and all three branches are real") {
    val got = graft.SparkEntry.queries("q_epoch_plan")(spark, Sf)
      .select("source", "source_tokens", "weight", "alloc_tokens", "full_epochs",
        "residual_tokens", "unfilled_tokens")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.size === 20)
    got.foreach { case (src, toks, w, alloc, full, resid, unfilled) =>
      assert(w === 1 + src.stripPrefix("src").toLong % 4, s"$src weight")
      assert(alloc === full * toks + resid + unfilled, s"$src allocation identity")
      assert(full <= 2, s"$src cap")
      if (full < 2) assert(unfilled === 0L, s"$src unfilled only when capped")
      else assert(resid === 0L, s"$src no residual at the cap")
    }
    // the planted weights make every branch real at every sf
    assert(got.exists(_._5 === 0L), "a subsample-only source must exist")
    assert(got.exists(r => r._5 === 1L && r._6 > 0L), "a mid source with residual")
    assert(got.exists(r => r._5 === 2L && r._7 > 0L), "a capped source with unfilled budget")
  }

  test("q_curriculum_order: dense global ranks, mean quality non-increasing along the curriculum") {
    val got = graft.SparkEntry.queries("q_curriculum_order")(spark, Sf)
      .select("bin_id", "mean_q_mu", "curriculum_rank")
      .as[(Long, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.map(_._3).sorted === (1L to got.size), "curriculum ranks dense 1..n")
    val byRank = got.sortBy(_._3)
    byRank.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a._2 >= b._2, s"rank ${a._3}→${b._3}: quality must not increase")
        if (a._2 === b._2) assert(a._1 < b._1, "ties break by bin_id")
      case _ =>
    }
    assert(got.map(_._2).min > 0L,
      "qualities stay positive — the div-semantics of the two engines never diverge")
  }

  test("q_tokenizer_fertility: per-lang ratios are exact integer permille with sane bounds") {
    val got = graft.SparkEntry.queries("q_tokenizer_fertility")(spark, Sf)
      .select("lang", "n_docs", "ws_tokens", "bpe_tokens", "n_chars",
        "fertility_permille", "chars_per_token_permille")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.map(_._1).sorted === Seq("de", "en", "es", "fr", "zh"),
      "all five corpus languages must report")
    got.foreach { case (lang, nDocs, ws, bpe, chars, fert, cpt) =>
      assert(nDocs > 0 && ws > 0 && bpe > 0, s"$lang empty")
      // a 1-merge BPE emits ≥1 symbol per word and ≤len(word) symbols,
      // and n_chars counts separators too — so ws ≤ bpe ≤ n_chars
      assert(ws <= bpe, s"$lang: fewer BPE symbols than words")
      assert(bpe <= chars, s"$lang: more BPE symbols than chars")
      // the permille columns are pure restatements of the sums
      assert(fert === bpe * 1000 / ws, s"$lang fertility not exact")
      assert(cpt === chars * 1000 / bpe, s"$lang chars/token not exact")
    }
  }
}
