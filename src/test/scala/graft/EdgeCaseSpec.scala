package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.analytics.{Relational, Stats}
import graft.dedup.{ExactDedup, MinHashLsh, NGramJaccard, SimHash}
import graft.operators.{AsOfJoin, RangeJoin, SkewJoin}
import graft.similarity.{EmbeddingDedup, Knn}
import graft.streaming.EventStreams
import graft.text.{Fingerprint, TextAnalysis}

/** Degenerate-input hardening: every operator family must return an empty
  * (or well-typed) result on empty input, never throw — at 100 TB some
  * partition, some day, WILL be empty.
  */
class EdgeCaseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private lazy val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val noEvents = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType))))

  test("dedup operators on empty input") {
    assert(ExactDedup.groups(noDocs, col("text"), col("doc_id")).count() === 0)
    assert(MinHashLsh.nearDuplicates(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(SimHash.nearDuplicates(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(NGramJaccard.blockedPairs(noDocs, col("doc_id"), col("text"), col("source")).count() === 0)
  }

  test("similarity operators on empty input") {
    assert(EmbeddingDedup.nearDuplicatePairs(noVecs, 0.9).count() === 0)
    assert(EmbeddingDedup.nearDuplicatePairsLsh(noVecs, 0.9).count() === 0)
    assert(Knn.bruteForceTopK(noVecs, noVecs, 5).count() === 0)
  }

  test("round-2 operators on degenerate input") {
    // bounded self-pairs: empty frame and a single-row key → no pairs
    assert(SkewJoin.boundedSelfPairs(
      Seq.empty[(String, Long, Long)].toDF("k", "id", "pay"),
      Seq("k"), col("id"), col("pay"), 16).count() === 0)
    assert(SkewJoin.boundedSelfPairs(
      Seq(("a", 1L, 7L)).toDF("k", "id", "pay"),
      Seq("k"), col("id"), col("pay"), 2).count() === 0)
    // weighted minhash: empty input and a one-token doc both survive
    assert(MinHashLsh.nearDuplicatesWeighted(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(MinHashLsh.weightedSignatures(
      Seq((1L, "word")).toDF("doc_id", "text"), col("doc_id"), col("text"), 3, 8).count() === 1)
    // containment inverted index on empty input
    assert(NGramJaccard.containmentPairs(noDocs, col("doc_id"), col("text"), col("source")).count() === 0)
    // shared runs on empty input
    assert(Fingerprint.sharedRunPairs(noDocs, col("doc_id"), col("text")).count() === 0)
    // z-order: constant column collapses to one grid cell, still writes
    val dir = java.nio.file.Files.createTempDirectory("graft_zconst").toString
    sources.ZOrder.writeZOrdered(
      Seq((1L, 5.0), (2L, 5.0)).toDF("a", "b"), dir, "a", "b", numFiles = 2)
    assert(spark.read.parquet(dir).count() === 2)
    // ...and empty input writes an empty (readable) dataset
    val dir2 = java.nio.file.Files.createTempDirectory("graft_zempty").toString
    sources.ZOrder.writeZOrdered(
      Seq.empty[(Long, Double)].toDF("a", "b"), dir2, "a", "b", numFiles = 2)
    assert(spark.read.parquet(dir2).count() === 0)
  }

  test("round-3 operators on degenerate input") {
    // Empty-string docs hash to a single sentinel gram that they SHARE —
    // the prefix-filtered core must keep exact parity with the direct
    // all-pairs form (the empties are mutual 1.0-containment duplicates).
    val docs = Seq((1L, "", "b"), (2L, "", "b"),
      (3L, "x y z w v u t s r q", "b")).toDF("doc_id", "text", "source")
    val got = NGramJaccard.containmentPairs(docs, col("doc_id"), col("text"), col("source"))
      .as[(Long, Long, Double, Double)].collect().toSet
    val sets = docs.select(col("doc_id").as("id"), NGramJaccard.ngramSet(col("text"), 3).as("g"))
    val direct = sets.select(col("id").as("id_a"), col("g").as("ga"))
      .join(sets.select(col("id").as("id_b"), col("g").as("gb")), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        NGramJaccard.containment(col("ga"), col("gb")).as("c_ab"),
        NGramJaccard.containment(col("gb"), col("ga")).as("c_ba"))
      .filter(col("c_ab") >= 0.8 || col("c_ba") >= 0.8)
      .as[(Long, Long, Double, Double)].collect().toSet
    CachePool.releaseAll()
    assert(got === direct)
    assert(got.map(p => (p._1, p._2)) === Set((1L, 2L)))

    // OPQ on a zero-variance corpus: the covariance is the zero matrix —
    // the rotation degenerates to a (still orthogonal) identity and the
    // search must return k well-formed rows, not crash.
    val const = (0 until 40).map(i => (i.toLong, Array.fill(64)(1.0f)))
      .toDF("vec_id", "embedding")
    val top = graft.similarity.OpqKnn.approxTopK(const, const.filter(col("vec_id") < 2), k = 3)
    assert(top.count() === 6)
    CachePool.releaseAll()
  }

  test("round-4 operators on degenerate input") {
    import graft.text.{Decontaminate, Repetition, SeqPack, TfIdf}
    // empty corpus everywhere → empty, well-typed results
    assert(TfIdf.topTerms(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(Repetition.repetitionStats(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(Decontaminate.overlaps(noDocs, noDocs, col("doc_id"), col("text")).count() === 0)
    assert(SeqPack.packGreedy(noDocs, col("doc_id"), lit(1), 10, 4).count() === 0)
    // an empty eval set decontaminates nothing
    val one = Seq((1L, "some text here")).toDF("doc_id", "text")
    assert(Decontaminate.overlaps(one, noDocs.select(col("doc_id"), col("text")),
      col("doc_id"), col("text")).count() === 0)
    // empty-STRING docs: every op emits a row, never throws. The empty
    // doc's single sentinel gram hits the eval empty doc (by design — the
    // whole-text gram of "" equals the whole-text gram of "").
    val empties = Seq((1L, ""), (2L, "")).toDF("doc_id", "text")
    assert(Repetition.repetitionStats(empties, col("doc_id"), col("text")).count() === 2)
    assert(Decontaminate.overlaps(empties, empties, col("doc_id"), col("text")).count() === 2)
    // budget smaller than every doc: each doc gets its own bin, ids dense
    val tiny = Seq((10L, 5), (11L, 7), (12L, 6)).toDF("doc_id", "n")
    val bins = SeqPack.packGreedy(tiny, col("doc_id"), col("n"), budget = 1, groupSize = 2)
      .select("bin_id").as[Long].collect().sorted
    assert(bins === Array(0L, 1L, 2L))
    CachePool.releaseAll()
  }

  test("round-5 operators on degenerate input") {
    import graft.dedup.DedupClusters
    import graft.text.{DocPipeline, TfIdf}
    // CC on an empty pair list → empty labels, all variants; auto included
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(DedupClusters.components(noPairs).count() === 0)
    assert(DedupClusters.componentsAuto(noPairs).count() === 0)
    // boilerplate side channel: empty corpus and no-hot-run corpus → empty
    assert(Fingerprint.boilerplateRuns(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(Fingerprint.boilerplateRuns(
      Seq((1L, "a b c")).toDF("doc_id", "text"), col("doc_id"), col("text"),
      maxRunDf = 1).count() === 0)
    // maxRunDf = 1: EVERY shared run is "boilerplate" → zero pairs
    val twins = Seq((1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight")).toDF("doc_id", "text")
    assert(Fingerprint.sharedRunPairs(twins, col("doc_id"), col("text"),
      maxRunDf = 1).count() === 0)
    // grouped quantile sketch: empty input → no groups; single row → cert ok
    assert(Stats.groupQuantilesSketch(noDocs, col("source"), lit(1.0),
      Seq(0.5)).count() === 0)
    val one = Stats.groupQuantilesSketch(
        Seq(("g", 3.0)).toDF("k", "v"), col("k"), col("v"), Seq(0.25, 0.5, 0.75))
      .select("rank_ok").as[Boolean].collect()
    assert(one.length === 3 && one.forall(identity))
    // survivors: no pairs → every doc survives as itself
    val docs3 = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val surv = DocPipeline.survivorsByQuality(docs3, col("doc_id"), col("text"), noPairs)
      .select("comp", "doc_id").as[(Long, Long)].collect().toSet
    assert(surv === Set((1L, 1L), (2L, 2L)))
    // incremental tf-idf: empty batch against a snapshot → empty
    assert(TfIdf.topTermsAgainst(noDocs,
      Seq(("x", 1L)).toDF("term", "df"), 1L, col("doc_id"), col("text")).count() === 0)
    CachePool.releaseAll()
  }

  test("round-5 continuation operators on degenerate input") {
    import graft.dedup.BloomDedup
    import graft.text.{ChunkDedup, DocPipeline}
    // ndv sketch: empty input → no groups, never a null boolean
    assert(Stats.ndvSketch(noDocs, col("source"), col("text")).count() === 0)
    // chunk dedup: empty corpus → empty; all-boilerplate corpus → rows
    // with empty text_clean (exercised in CurationOpsSpec)
    assert(ChunkDedup.dedupChunks(noDocs, col("doc_id"), col("text")).count() === 0)
    // funnel: a corpus whose every doc fails the quality gate must report
    // 0 (not NULL) for the dedup/quota stages
    val junk = Seq((1L, "s0", "x"), (2L, "s0", "y")).toDF("doc_id", "source", "text")
    val funnel = DocPipeline.filterFunnel(
        junk, col("doc_id"), col("text"), col("source"), Array.empty[Long])
      .select("n_out").as[Long].collect().toList
    assert(funnel === List(2L, 0L, 0L, 0L, 0L))
    // bloom: empty snapshot → everything passes; empty batch → zeros
    val snap1 = Seq((1L, "snapshot doc")).toDF("doc_id", "text")
    val batch1 = Seq((2L, "fresh doc")).toDF("doc_id", "text")
    val emptySnap = BloomDedup.incrementalStats(
      noDocs.select("doc_id", "text"), batch1, col("doc_id"), col("text"),
      expectedItems = 1L).collect()(0)
    assert(emptySnap.getAs[Long]("n_true_dup") === 0L)
    assert(emptySnap.getAs[Long]("n_pass") === 1L)
    val emptyBatch = BloomDedup.incrementalStats(
      snap1, noDocs.select("doc_id", "text"), col("doc_id"), col("text"),
      expectedItems = 1L).collect()(0)
    assert(emptyBatch.getAs[Long]("n_batch") === 0L)
    assert(emptyBatch.getAs[Long]("n_pass") === 0L)
    assert(emptyBatch.getAs[Boolean]("fp_ok"))
    // temperature mix on an empty corpus → empty selection, no NPE
    val (sel, tgt) = graft.etl.Sampling.temperatureMix(
      noDocs, col("doc_id"), col("source"), lit(10L))
    assert(sel.count() === 0 && tgt.count() === 0)
    // topic-cluster gate on empty embeddings → vacuous row, no k-means fit
    val gate = graft.similarity.TopicClusters.clusterGate(
      noVecs, col("vec_id"), col("embedding"), k = 4).collect()(0)
    assert(gate.getAs[Long]("n_vecs") === 0L)
    assert(gate.getAs[Boolean]("inertia_ok"))
    CachePool.releaseAll()
  }

  test("round-5 third-session operators on degenerate input") {
    import graft.streaming.AdmissionQuota
    import graft.text.{DocPipeline, Vocab}
    // vocab family: empty corpus → empty frames, not errors
    assert(Vocab.topTerms(noDocs, col("doc_id"), col("text"), 10).count() === 0)
    assert(Vocab.mergePairStats(noDocs, col("doc_id"), col("text"), 10, 10).count() === 0)
    val noMerges = Vocab.bpeMerges(noDocs, col("doc_id"), col("text"), 10, 10)
    assert(noMerges.count() === 0)
    assert(noMerges.columns.toSeq === Seq("rank", "left", "right", "merged", "weight"))
    // a single-character vocabulary admits no merges
    val oneChar = Seq((1L, "a a b")).toDF("doc_id", "text")
    assert(Vocab.bpeMerges(oneChar, col("doc_id"), col("text"), 10, 10).count() === 0)
    // encode under the empty table = char count; empty corpus → no rows
    assert(noDocs.select(graft.functions.BpeExprs.encodeCount(
      TextAnalysis.tokens(col("text")), Nil)).count() === 0)
    // admission quota: k = 0 admits nothing; empty input → empty output
    val arrivals = Seq(AdmissionQuota.DocArrival(1L, "s")).toDS()
    assert(AdmissionQuota.admitFirstK(arrivals, k = 0).count() === 0)
    assert(AdmissionQuota.admitFirstK(
      Seq.empty[AdmissionQuota.DocArrival].toDS(), k = 3).count() === 0)
    // survivor halves compose on an empty pair graph: everyone survives
    val docs3 = Seq((1L, "alpha beta gamma"), (2L, "delta epsilon zeta"))
      .toDF("doc_id", "text")
    val noPairs2 = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val lbl = DocPipeline.clusterLabeled(docs3, col("doc_id"), col("text"), noPairs2)
    assert(DocPipeline.survivorsFromLabeled(lbl).count() === 2)
    CachePool.releaseAll()
  }

  test("text operators on empty input and empty strings") {
    assert(TextAnalysis.langId(noDocs, col("doc_id"), col("text")).count() === 0)
    assert(Fingerprint.fingerprints(noDocs, col("doc_id"), col("text")).count() === 0)
    // an empty STRING must produce a row, not a crash (ratios go null/NaN-free path)
    val one = Seq((1L, "")).toDF("doc_id", "text")
    assert(TextAnalysis.tokenCounts(one, col("doc_id"), col("text"))
      .select("ws_tokens").as[Int].head() === 0)
    assert(Fingerprint.fingerprints(one, col("doc_id"), col("text")).count() === 1)
  }

  test("streaming batch forms and analytics on empty input") {
    assert(EventStreams.sessionize(noEvents).count() === 0)
    assert(EventStreams.tumblingAgg(noEvents).count() === 0)
    assert(Relational.eventRollup(noEvents).count() === 0)
    assert(Stats.topGroupsByCount(noDocs, col("source"), 10).count() === 0)
  }

  test("session-4 operators on degenerate input") {
    import graft.etl.Sampling
    import graft.functions.PackExprs
    import graft.streaming.AdmissionQuota
    import graft.streaming.AdmissionQuota.ScoredArrival
    import graft.text.{Dsir, QualityClassifier, SeqPack}
    // top-k quota with k = 0 admits nothing; empty input emits nothing
    assert(AdmissionQuota.admitTopKByQuality(
      Seq(ScoredArrival(1L, "w", 0.5)).toDS(), k = 0).count() === 0)
    assert(AdmissionQuota.admitTopKByQuality(
      Seq.empty[ScoredArrival].toDS(), k = 3).count() === 0)
    // FFD on an empty group array and on all-zero sizes
    assert(Seq(Tuple1(Seq.empty[Int])).toDF("s")
      .select(PackExprs.ffdBins(col("s"), 10)).as[Seq[Long]].head() === Seq.empty)
    assert(Seq(Tuple1(Seq(0, 0, 0))).toDF("s")
      .select(PackExprs.ffdBins(col("s"), 10)).as[Seq[Long]].head() === Seq(0L, 0L, 0L))
    assert(SeqPack.packFfd(noDocs, col("doc_id"), lit(1), 10, 4).count() === 0)
    CachePool.releaseAll()
    // token mix with an empty corpus: empty selection, empty targets
    val (sel, targets) = Sampling.tokenBudgetMix(
      noDocs, col("doc_id"), col("source"), lit(1L), lit(100L))
    assert(sel.count() === 0 && targets.count() === 0)
    CachePool.releaseAll()
    // DSIR with an empty target: no bucket is target-hot, nothing selected
    val raw = Seq((1L, "alpha beta")).toDF("doc_id", "text")
    val st = Dsir.importanceStats(raw, noDocs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Boolean)].collect()
    assert(st === Array((1L, 3L, 0L, false)))
    CachePool.releaseAll()
    // classifier on empty classes: zero model, gate counts stay 0
    val gate = QualityClassifier.trainGate(
      noDocs, noDocs, col("doc_id"), col("text"), buckets = 64, iters = 3)
      .collect()(0)
    assert(gate.getAs[Long]("n_pos") === 0L && gate.getAs[Long]("n_neg") === 0L)
    CachePool.releaseAll()
  }

  test("seventh-session operators on degenerate input") {
    import graft.analytics.{EventAnalytics, Olap, SpatialBins}
    import graft.etl.SnapshotDiff
    // event analytics over an empty log: typed empty frames, no throw
    assert(EventAnalytics.funnel(noEvents, col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view")).count() === 2) // 0-count rows
    assert(EventAnalytics.funnel(noEvents, col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view"))
      .agg(sum("n_users")).as[Long].collect().head === 0L)
    assert(EventAnalytics.retentionWeekly(noEvents, col("user_id"), col("ts"))
      .count() === 0)
    assert(EventAnalytics.gapFillDaily(noEvents, col("user_id"), col("ts"))
      .count() === 0)
    graft.CachePool.releaseAll()
    // single-row frames: funnel depth 1, gap fill grid of one day
    val one = Seq((1L, new java.sql.Timestamp(86400000L), 1L, "signup", 0.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .select("event_id", "ts", "user_id", "event_type", "value")
    assert(EventAnalytics.funnel(one, col("user_id"), col("ts"),
      col("event_type"), Seq("signup", "view"))
      .as[(Int, String, Long)].collect().toList.map(_._3) === List(1L, 0L))
    assert(EventAnalytics.gapFillDaily(one, col("user_id"), col("ts"))
      .as[(Long, Long, Long, Long)].collect().toList === List((1L, 1L, 1L, 1L)))
    graft.CachePool.releaseAll()
    // empty snapshots: diff classifies nothing, drift joins to nothing
    val e = Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
    assert(SnapshotDiff.diffCounts(e, e, col("doc_id"), xxhash64(col("text")))
      .count() === 0)
    assert(SnapshotDiff.driftTable(e, e, col("source"),
      length(col("text"))).count() === 0)
    // winsorize/moments/cube/mode on empty frames
    assert(Stats.winsorizedStats(e.select(col("source").as("k"),
      col("doc_id").cast("double").as("v")), col("k"), col("v")).count() === 0)
    assert(Stats.corrMoments(e, col("source"), col("doc_id"), col("doc_id"))
      .count() === 0)
    // grouped grouping-sets on empty input emit NO rows (the grand
    // total is a grouping set, not an ungrouped aggregate)
    assert(Olap.cubeStats(e, col("source"), col("text"), lit(1L))
      .count() === 0)
    assert(SpatialBins.binCounts(
      Seq.empty[(Double, Double, Double)].toDF("la", "lo", "v"),
      col("la"), col("lo"), col("v"), Seq(4)).count() === 0)
    // keyset pagination past the last page returns empty, not an error
    val scored = Seq((1L, "s", 1.0)).toDF("doc_id", "source", "quality_score")
    val p1 = graft.text.DocPipeline.pageByQuality(scored, 5)
    val p2 = graft.text.DocPipeline.pageByQuality(scored, 5,
      Some(graft.text.DocPipeline.pageCursors(p1)))
    assert(p1.count() === 1 && p2.count() === 0)
  }

  test("multimodal codec paths on empty input") {
    import graft.multimodal.Multimodal
    val m = Multimodal.imageMedia(noDocs)
    assert(m.count() === 0)
    assert(Multimodal.decodeImageFeatures(m).count() === 0)
    assert(Multimodal.resizeImages(m, 8, 8).count() === 0)
    val a = Multimodal.audioMedia(noDocs)
    assert(a.count() === 0)
    assert(Multimodal.decodeAudioFeatures(a).count() === 0)
  }

  test("round-9 operators on empty/degenerate input") {
    import graft.multimodal.Multimodal
    // multi-frame codec: empty docs → empty containers; junk payload → dropped
    val v = Multimodal.videoMedia(noDocs)
    assert(v.count() === 0)
    assert(Multimodal.sampleFrames(v).count() === 0)
    // URL ops: empty frame and null url survive
    assert(graft.text.UrlOps.domainStats(
      Seq.empty[(Long, String)].toDF("id", "url"), col("url")).count() === 0)
    val withNull = graft.text.UrlOps.parseUrls(
        Seq((1L, null: String)).toDF("id", "url"), col("url"))
      .select("host").collect()
    assert(withNull.length === 1) // null propagates, no throw
    // exact-k stratified sample of nothing is nothing
    assert(graft.etl.Sampling.stratifiedExactK(
      noDocs, col("source"), col("doc_id"), 3).count() === 0)
    // quality ECDF over a single-doc source: one decile-0 row, pct 0
    val one = Seq((7L, "a few plain words of text here", "solo"))
      .toDF("doc_id", "text", "source")
    val cells = graft.text.DocPipeline.qualityEcdfDeciles(
        one, col("doc_id"), col("text"), col("source"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(cells === Seq(("solo", 0L, 1L, 7L)))
    // perceptual lanes on empty input (Multimodal imported at block top)
    val noMedia = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "payload")
    assert(Multimodal.dHash64(noMedia).count() === 0)
    assert(Multimodal.audioFingerprint64(noMedia).count() === 0)
    assert(Multimodal.resampleAudio(noMedia).count() === 0)
    assert(Multimodal.imageNearDuplicates(noMedia).count() === 0)
    // chunker on an empty frame
    assert(graft.text.Chunker.chunkTokens(
      noDocs, col("doc_id"), col("text"), 32, 16).count() === 0)
    // RRF with an empty shortlist
    assert(graft.similarity.HybridSearch.rrfFuse(
      Seq.empty[(Long, Int, Long)].toDF("query_id", "rnk", "neighbor_id"),
      Seq((1L, 0.5)).toDF("id", "prior_score"), k = 5).count() === 0)
  }

  test("round-10 operators on empty/degenerate input") {
    import graft.analytics.GeoDistanceJoin
    val noPts = Seq.empty[(Long, Double, Double)].toDF("id", "lat", "lon")
    // geo join family: empty input, single point, null coordinates —
    // all empty results, never a throw
    assert(GeoDistanceJoin.withinRadiusPairs(
      noPts, col("id"), col("lat"), col("lon"), 100.0).count() === 0)
    assert(GeoDistanceJoin.nearestNeighbors(
      noPts, col("id"), col("lat"), col("lon"), 100.0, k = 2).count() === 0)
    val single = Seq((1L, 10.0, 20.0)).toDF("id", "lat", "lon")
    assert(GeoDistanceJoin.withinRadiusPairs(
      single, col("id"), col("lat"), col("lon"), 100.0).count() === 0)
    val withNull = Seq((1L, Some(10.0), Some(20.0)), (2L, None, Some(20.0)),
        (3L, Some(10.1), Some(20.1)))
      .toDF("id", "lat", "lon")
    val pairs = GeoDistanceJoin.withinRadiusPairs(
      withNull, col("id"), col("lat"), col("lon"), 100.0)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.map(p => (p._1, p._2)) === Set((1L, 3L))) // null row drops out
    // shard manifest of an empty packing is empty; sepTokens=0 legal
    val noPack = Seq.empty[(Long, Int, Long)].toDF("doc_id", "n_tokens", "bin_id")
    assert(graft.text.SeqPack.shardManifest(noPack).count() === 0)
    assert(graft.text.SeqPack.shardManifest(
      Seq((1L, 5, 0L)).toDF("doc_id", "n_tokens", "bin_id"), sepTokens = 0)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList ===
      List((0L, 1L, 5L, 5L, 0L, 1L)))
  }

  test("round-10 second-session operators on empty/degenerate input") {
    // PageRank: empty graph → empty ranks; self-loop-only graph is a
    // fixpoint (one vertex, all mass recycled)
    val noLinks = Seq.empty[(Long, Long)].toDF("src", "dst")
    assert(graft.analytics.LinkGraph.pageRankInt(noLinks, iters = 2).count() === 0)
    assert(graft.analytics.LinkGraph.pageRankInt(
        Seq((7L, 7L)).toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toList === List((7L, 1000000L)))
    // zero iterations: everyone at the initial rank
    assert(graft.analytics.LinkGraph.pageRankInt(
        Seq((1L, 2L)).toDF("src", "dst"), iters = 0)
      .as[(Long, Long)].collect().toMap === Map(1L -> 1000000L, 2L -> 1000000L))
    // splitByCluster with an EMPTY component map degrades to split()
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val emptyComp = Seq.empty[(Long, Long)].toDF("id", "comp")
    val viaCluster = graft.etl.Sampling
      .splitByCluster(docs, col("doc_id"), emptyComp, Seq(0.5, 0.5))
      .select("doc_id", "split").as[(Long, Int)].collect().toMap
    val viaPlain = graft.etl.Sampling.split(docs, col("doc_id"), Seq(0.5, 0.5))
      .zipWithIndex.flatMap { case (df, i) =>
        df.select("doc_id").as[Long].collect().map(_ -> i)
      }.toMap
    assert(viaCluster === viaPlain)
    // fuzzy decontamination against an empty eval set flags nothing
    assert(graft.text.Decontaminate.overlapsNearDup(
      docs, docs.limit(0), col("doc_id"), col("text")).count() === 0)
  }

  test("round-10 third-session operators on empty/degenerate input") {
    // span excision: empty corpus → empty everything; a single doc has
    // no earlier occurrence anywhere, so nothing is excised
    assert(graft.text.SpanDedup.duplicateSpans(
      noDocs, col("doc_id"), col("text")).count() === 0)
    val one = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    assert(graft.text.SpanDedup.duplicateSpans(one, col("doc_id"), col("text"))
      .count() === 0)
    assert(graft.text.SpanDedup.exciseSpans(one, col("doc_id"), col("text"))
      .select("clean_text").as[String].head() === "a b c d e f g h i j")
    // collocations: empty corpus and an all-unique corpus both emit none
    assert(graft.text.Collocations.pmiBigrams(noDocs, col("text")).count() === 0)
    assert(graft.text.Collocations.pmiBigrams(one, col("text"),
      minCount = 2L).count() === 0)
    // outliers: empty input → empty; constant group → MAD 0, no outliers
    assert(Stats.robustOutliers(noDocs, col("source"),
      length(col("text"))).count() === 0)
    val const = Seq.fill(5)(("g", 7L)).toDF("k", "v")
    assert(Stats.robustOutliers(const, col("k"), col("v"))
      .as[(String, Long, Long, Long, Long)].head() === (("g", 5L, 14L, 0L, 0L)))
    // triangles: empty and triangle-free graphs count nothing
    assert(graft.analytics.LinkGraph.triangleCounts(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() === 0)
    assert(graft.analytics.LinkGraph.triangleCounts(
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")).count() === 0)
    // EWMA: empty events → empty; anomalies on a 1-day series flag nothing
    assert(graft.analytics.EventAnalytics.ewmaDaily(
      noEvents, col("event_type"), col("ts")).count() === 0)
    val oneDay = Seq((1L, 0L, "a")).toDF("user_id", "t", "event_type")
      .withColumn("ts", timestamp_seconds(col("t")))
    val an = graft.analytics.EventAnalytics.ewmaAnomalies(
        oneDay, col("event_type"), col("ts"))
      .select("is_burst", "is_drop").as[(Boolean, Boolean)].collect().toSeq
    assert(an === Seq((false, false)))
    // SCD2 on empty events → empty history
    assert(graft.etl.SnapshotDiff.scd2History(
      Seq.empty[(Long, Long, java.sql.Timestamp)].toDF("id", "ver", "eff_ts"),
      "id", "eff_ts", "ver").count() === 0)
    // profile on an empty frame: counters all zero, one row per column
    val prof = graft.etl.Observability.profile(noDocs, Seq("doc_id", "text"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(prof === Seq(("doc_id", 0L, 0L, 0L), ("text", 0L, 0L, 0L)))
  }

  test("join operators on empty sides") {
    val pts = Seq.empty[(Long, Double)].toDF("pid", "x")
    val ivs = Seq((1L, 0.0, 10.0)).toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(pts, "x", ivs, "lo", "hi", 5.0).count() === 0)
    assert(RangeJoin.pointInInterval(
      Seq((1L, 5.0)).toDF("pid", "x"), "x", ivs.limit(0), "lo", "hi", 5.0).count() === 0)
    val l = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "ts", "event_id")
    val r = Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("k", "ts", "view_id")
    assert(AsOfJoin.asOf(l, r, "k", "ts").count() === 0)
    assert(SkewJoin.saltedInnerJoin(
      Seq.empty[(String, Long)].toDF("k", "v"),
      Seq(("a", 1)).toDF("k", "w"), "k").count() === 0)
  }

  test("round-11 operators survive empty and degenerate inputs") {
    // Gopher rules on the empty and whitespace-only document: zero
    // tokens/lines/paragraphs must produce well-defined flags, not a
    // crash or NULL (0 <= 0 ratios pass by convention)
    val degenerate = Seq((1L, ""), (2L, "   "), (3L, "\n\n\n")).toDF("doc_id", "text")
    val gf = graft.text.GopherFilters.flags(degenerate, col("doc_id"), col("text"))
    assert(gf.count() === 3)
    assert(gf.filter(col("keep").isNull).count() === 0)
    val gn = graft.text.GopherFilters.ngramFlags(degenerate, col("doc_id"), col("text"))
    assert(gn.count() === 3)
    assert(gn.filter(col("keep").isNull || col("total_chars").isNull).count() === 0)

    // AUC with a single class present: integer surface stays defined
    // (den = 0), no division anywhere inside the operator
    val onePos = Seq((1.0, 1L), (2.0, 1L)).toDF("s", "label")
    val auc = Stats.aucExact(onePos, col("s"), col("label"))
      .as[(Long, Long, Long, Long)].head()
    assert(auc === ((2L, 0L, 0L, 0L)))
    graft.CachePool.releaseAll()

    // empty-corpus mixing: no rows out, no crash
    val noTok = Seq.empty[(Long, String, Long)].toDF("doc_id", "source", "n_tok")
    assert(graft.etl.Sampling.unimaxTargets(
      noTok, col("source"), col("n_tok")).count() === 0)
    assert(graft.etl.Sampling.unimaxSelect(
      noTok, col("doc_id"), col("source"), col("n_tok")).count() === 0)
    graft.CachePool.releaseAll()

    // empty-frame global shuffle order
    assert(graft.etl.Sampling.shuffleOrder(
      noDocs, col("doc_id"), "train_pos").count() === 0)
    graft.CachePool.releaseAll()

    // mojibake repair: empty string and lone high bytes stay put
    assert(graft.functions.MojibakeRepair.fix("") === "")
    assert(graft.functions.MojibakeRepair.fix("\u00e9") === "\u00e9")
  }
}
