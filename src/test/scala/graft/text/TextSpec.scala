package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupData

class TextSpec extends SparkSpec {
  import spark.implicits._

  test("langId picks the language with the most marker stopwords") {
    val df = Seq(
      (1L, "the cat is on the mat and happy"),
      (2L, "el perro y la casa de los amigos"),
      (3L, "der hund und die katze ist nicht da"),
      (4L, "le chat et les amis des bois est la"),
      (5L, "的 是 了 在 和 有 不")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.langId(df, col("doc_id"), col("text"))
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "en", 2L -> "es", 3L -> "de", 4L -> "fr", 5L -> "zh"))
  }

  test("qualityScore computes exact counts and fixed-order ratios") {
    val df = Seq((1L, "The cat, the hat!")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityScore(df, col("doc_id"), col("text")).collect()(0)
    assert(r.getAs[Int]("n_tokens") === 4)
    // 17 chars, 12 alpha, 2 punct (',' and '!'), 2 'the' stopwords
    assert(r.getAs[Double]("alpha_ratio") === 12.0 / 17)
    assert(r.getAs[Double]("punct_ratio") === 2.0 / 17)
    assert(r.getAs[Double]("stop_ratio") === 2.0 / 4)
  }

  test("tokenCounts: whitespace, regex, and chars/4 estimates") {
    val df = Seq((1L, "abc de-f 42!")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(df, col("doc_id"), col("text")).collect()(0)
    assert(r.getAs[Int]("ws_tokens") === 3)
    // regex tokens: abc, de, -, f, 42, !  → 6
    assert(r.getAs[Int]("re_tokens") === 6)
    assert(r.getAs[Long]("est_bpe_tokens") === 3L) // ceil(12/4)
  }

  test("DocPipeline removes planted exact dups and keeps near-dups distinct") {
    val docs = table("documents")
    val planted = DedupData.withPlantedDups(docs)
    val corpus = DocPipeline.corpus(planted, col("doc_id"), col("text"))
    val ids = corpus.select("doc_id").as[Long].collect().toSet
    val exactIds = docs.filter(col("doc_id") % 7 === 0).select("doc_id").as[Long].collect().toSet
    // planted exact copies (id + 1e6) must be gone, originals kept
    assert(exactIds.forall(i => ids.contains(i) && !ids.contains(i + DedupData.ExactIdOffset)))
    // near-dup copies are NOT exact-equal → they survive this stage
    val nearSurvivors = ids.count(_ >= DedupData.NearIdOffset)
    assert(nearSurvivors > 0)
  }

  test("fingerprints: normalization-equal docs share doc_fp; distinct docs do not") {
    val planted = DedupData.withPlantedDups(table("documents"))
    val fps = Fingerprint.fingerprints(planted, col("doc_id"), col("text"))
    val byFp = fps.groupBy("doc_fp").agg(collect_set("doc_id").as("ids"))
    val exactIds = table("documents").filter(col("doc_id") % 7 === 0)
      .select("doc_id").as[Long].collect().toSet
    val merged = byFp.filter(size(col("ids")) >= 2)
      .select(explode(col("ids")).as("id")).as[Long].collect().toSet
    assert(exactIds.forall(i => merged.contains(i) && merged.contains(i + DedupData.ExactIdOffset)))
  }

  test("Redact scrubs URLs, emails, phones and IPs sequentially") {
    val docs = Seq(
      (1L, "reach me at jane_doe%x@corp.example.io or https://a:b@h.example.com/x?y=1 " +
        "then +44 20-7946 0958 from 192.168.0.1 thanks"),
      (2L, "no pii here just words"),
      (3L, "")).toDF("doc_id", "text")
    val out = Redact.redactWithCounts(docs, col("doc_id"), col("text"))
      .orderBy("doc_id")
      .as[(Long, String, Int, Int, Int, Int)].collect()
    val (id1, t1, urls1, emails1, phones1, ips1) = out(0)
    assert(id1 === 1L)
    assert(t1 === "reach me at <EMAIL> or <URL> then <PHONE> from <IP> thanks")
    // the URL's embedded a:b@h credentials must NOT also count as an
    // e-mail: the chain counts on the previous stage's output.
    assert((urls1, emails1, phones1, ips1) === ((1, 1, 1, 1)))
    assert(out(1) === ((2L, "no pii here just words", 0, 0, 0, 0)))
    assert(out(2) === ((3L, "", 0, 0, 0, 0)))
  }

  test("sharedRunPairs links docs sharing a verbatim 8-token run") {
    val planted = DedupData.withPlantedDups(table("documents"))
    val pairs = Fingerprint.sharedRunPairs(planted, col("doc_id"), col("text"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val nearIds = table("documents").filter(col("doc_id") % 5 === 0)
      .select("doc_id").as[Long].collect().toSet
    val missing = nearIds.filterNot(i => pairs.contains((i, i + DedupData.NearIdOffset)))
    assert(missing.isEmpty, s"fingerprint missed ${missing.size} planted near pairs")
  }

  test("survivorsByQuality keeps the best-quality member per cluster; isolated docs survive") {
    val docs = Seq(
      (1L, "!!! ??? %%% ..."),                        // punctuation soup: worst
      (2L, "the cat is on the mat and happy today"),  // stopword-rich: best
      (3L, "zzz qqq"),                                // middling
      (10L, "a plain doc here")                       // not in the pair graph
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = DocPipeline.survivorsByQuality(docs, col("doc_id"), col("text"), pairs)
      .select("comp", "doc_id").as[(Long, Long)].collect().toSet
    // cluster {1,2,3} (comp = min id 1) survives through doc 2 — the
    // argmax-quality member, NOT the min id; doc 10 survives as itself
    assert(got === Set((1L, 2L), (10L, 10L)))
  }

  test("clusterLabeledFromComp over a precomputed closure equals clusterLabeled") {
    val docs = Seq(
      (1L, "!!! ??? %%% ..."),
      (2L, "the cat is on the mat and happy today"),
      (3L, "zzz qqq"),
      (10L, "a plain doc here")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val direct = DocPipeline.clusterLabeled(docs, col("doc_id"), col("text"), pairs)
      .select("comp", "doc_id").as[(Long, Long)].collect().toSet
    val staged = DocPipeline.clusterLabeledFromComp(docs, col("doc_id"), col("text"),
        graft.dedup.DedupClusters.componentsAuto(pairs))
      .select("comp", "doc_id").as[(Long, Long)].collect().toSet
    assert(staged === direct)
    // and the survivor policy over the staged labels matches the fused path
    val survDirect = DocPipeline.survivorsByQuality(
        docs, col("doc_id"), col("text"), pairs)
      .select("comp", "doc_id").as[(Long, Long)].collect().toSet
    val survStaged = DocPipeline.survivorsFromLabeled(
        DocPipeline.clusterLabeledFromComp(docs, col("doc_id"), col("text"),
          graft.dedup.DedupClusters.componentsAuto(pairs)))
      .select("comp", "doc_id").as[(Long, Long)].collect().toSet
    assert(survStaged === survDirect)
  }

  test("calibrationGateWith / reliabilityGateWith over a pre-fit model equal the fused gates") {
    val pos = (1L to 30L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 130L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val model = QualityClassifier.fit(pos, neg, col("doc_id"), col("text"),
      buckets = 512, iters = 40, lr = 2.0)
    val calWith = QualityClassifier.calibrationGateWith(model, pos, neg,
        col("doc_id"), col("text"), bins = 6)
      .select("bin", "n_docs", "n_pos", "rate_monotone_ok")
      .as[(Long, Long, Long, Boolean)].collect().toList
    // identical integer/boolean cells as the fit-inside gate's pinned shape
    assert(calWith === List(
      (1L, 10L, 0L, true), (2L, 10L, 0L, true), (3L, 10L, 0L, true),
      (4L, 10L, 10L, true), (5L, 10L, 10L, true), (6L, 10L, 10L, true)))
    val relWith = QualityClassifier.reliabilityGateWith(model, pos, neg,
        col("doc_id"), col("text"), bins = 6)
      .select("bin", "n_docs", "n_pos", "gap_ok", "ece_ok")
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toList
    assert(relWith.map(r => (r._1, r._2, r._3)) ===
      List((1L, 10L, 0L), (2L, 10L, 0L), (3L, 10L, 0L),
        (4L, 10L, 10L), (5L, 10L, 10L), (6L, 10L, 10L)))
    assert(relWith.forall(r => r._4 && r._5))
    graft.CachePool.releaseAll()
  }

  test("sharedRunPairs maxRunDf drops boilerplate pairs, keeps genuine runs") {
    // 100 otherwise-unrelated docs share one planted boilerplate footer;
    // docs 1001/1002 share a genuine 8-token run and no footer.
    val footer = DedupData.BoilerFooter
    val boilerDocs = (1L to 100L).map(i =>
      (i, s"unique${i}a unique${i}b unique${i}c unique${i}d $footer"))
    val genuine = Seq(
      (1001L, "alpha beta gamma delta epsilon zeta eta theta shared tail run"),
      (1002L, "different head words alpha beta gamma delta epsilon zeta eta theta"))
    val docs = (boilerDocs ++ genuine).toDF("doc_id", "text")

    // without the cutoff: the footer alone contributes C(100,2) pairs
    val unbounded = Fingerprint.sharedRunPairs(docs, col("doc_id"), col("text"))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(unbounded.size >= 100 * 99 / 2)

    // with the cutoff: boilerplate pairs vanish, the genuine pair survives
    val cut = Fingerprint.sharedRunPairs(docs, col("doc_id"), col("text"), maxRunDf = 50)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(cut === Set((1001L, 1002L)))

    // and the excluded run surfaces in the side channel with its df
    val boiler = Fingerprint.boilerplateRuns(docs, col("doc_id"), col("text"), maxRunDf = 50)
      .select("run_df").as[Long].collect().toSeq
    assert(boiler === Seq(100L))
  }

  test("bm25TopTerms: saturation favors rare terms, length normalization penalizes long docs") {
    // doc 1 short, doc 2 long and repetitive; "rare" appears once in each,
    // "common" in all three docs.
    val docs = Seq(
      (1L, "rare common alpha"),
      (2L, "common common common common common common common common rare beta"),
      (3L, "common gamma")).toDF("doc_id", "text")
    val got = TfIdf.bm25TopTerms(docs, col("doc_id"), col("text"), k = 10)
      .select("doc_id", "term", "tf", "df", "dl", "bm25")
      .as[(Long, String, Long, Long, Long, Double)].collect()
    val byKey = got.map(r => (r._1, r._2) -> r).toMap
    // df/dl bookkeeping is exact
    assert(byKey((1L, "rare"))._4 === 2L && byKey((1L, "rare"))._5 === 3L)
    assert(byKey((2L, "common"))._3 === 8L && byKey((2L, "common"))._5 === 10L)
    // idf: a rarer term outranks a common one at equal tf within a doc
    assert(byKey((1L, "rare"))._6 > byKey((1L, "common"))._6)
    // length normalization: the same single "rare" occurrence scores
    // LOWER inside the long doc than inside the short one
    assert(byKey((1L, "rare"))._6 > byKey((2L, "rare"))._6)
    // tf saturation: 8 occurrences score far below 8x a single occurrence
    assert(byKey((2L, "common"))._6 < 8.0 * byKey((3L, "common"))._6)
    // per-doc ranking: doc 1's top term is its df=1 exclusive ("alpha"
    // beats "rare", df=2, at equal tf and dl — idf decides)
    val top1 = got.filter(_._1 == 1L).maxBy(_._6)._2
    assert(top1 === "alpha")
  }

  test("Vocab.topTerms counts occurrences and document frequency, ranked with tie-break") {
    val docs = Seq(
      (1L, "the cat and the hat"),
      (2L, "the dog"),
      (3L, "cat cat cat")
    ).toDF("doc_id", "text")
    val got = Vocab.topTerms(docs, col("doc_id"), col("text"), k = 3)
      .as[(String, Long, Long)].collect().toSeq
    // 'cat': 4 occurrences in 2 docs; 'the': 3 in 2; 'and'/'dog'/'hat' tie
    // at 1 — 'and' wins the term tie-break
    assert(got === Seq(("cat", 4L, 2L), ("the", 3L, 2L), ("and", 1L, 1L)))
  }

  test("Vocab.mergePairStats weights char pairs by word occurrences; 1-char words contribute none") {
    val docs = Seq(
      (1L, "abc abc ab"),
      (2L, "a a a a a a a a")   // single-char word: no pairs
    ).toDF("doc_id", "text")
    val got = Vocab.mergePairStats(docs, col("doc_id"), col("text"),
        topWords = 10, k = 10)
      .as[(String, Long)].collect().toSeq
    // 'abc'×2 → ab(2), bc(2); 'ab'×1 → ab(1) ⇒ ab=3, bc=2
    assert(got === Seq(("ab", 3L), ("bc", 2L)))
  }

  test("Vocab.bpeMerges replays classic BPE: greedy argmax merges, left-to-right in-word") {
    val docs = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val got = Vocab.bpeMerges(docs, col("doc_id"), col("text"),
        topWords = 10, nMerges = 10)
      .as[(Int, String, String, String, Long)].collect().toSeq
    // round 1: (a,a)=6 beats (a,b)=5 → merge aa; aaab→[aa,a,b]
    // round 2: (a,b)=3+2 beats (aa,a)=3 → merge ab; aaab→[aa,ab], ab→[ab]
    // round 3: (aa,ab)=3 → merge aaab; then no pairs remain (early stop)
    assert(got === Seq(
      (1, "a", "a", "aa", 6L),
      (2, "a", "b", "ab", 5L),
      (3, "aa", "ab", "aaab", 3L)))
  }

  test("byte-level bpeMerges equals char-level on ASCII; seeds UTF-8 bytes otherwise") {
    val ascii = Seq((1L, "aaab aaab aaab ab ab")).toDF("doc_id", "text")
    val char = Vocab.bpeMerges(ascii, col("doc_id"), col("text"), 10, 10).collect().toSeq
    val byte = Vocab.bpeMerges(ascii, col("doc_id"), col("text"), 10, 10,
      byteLevel = true).collect().toSeq
    assert(char === byte)
    // 'é' is 2 UTF-8 bytes (0xC3 0xA9): byte level's first merge fuses
    // them ((C3,A9) weight 2·2+1 = 5, beating (A9,C3) at 2), invisible
    // at char level where 'é' is already one symbol
    val nonAscii = Seq((1L, "éé éé é")).toDF("doc_id", "text")
    val bm = Vocab.bpeMerges(nonAscii, col("doc_id"), col("text"), 10, 1,
        byteLevel = true)
      .select("left", "right", "weight").as[(String, String, Long)].head()
    assert(bm === ((String.valueOf(0xC3.toChar), String.valueOf(0xA9.toChar), 5L)))
  }

  test("BPE sweep: nested prefix tables encode non-increasing; 1-rule point = greedy replace count") {
    import graft.functions.BpeExprs
    val docs = Seq(
      (1L, "aaab aaab aaab ab ab"),
      (2L, "banana bandana cabana"),
      (3L, "xyz")).toDF("doc_id", "text")
    val table = Vocab.bpeMerges(docs, col("doc_id"), col("text"),
        topWords = 50, nMerges = 8)
      .select("left", "right").as[(String, String)].collect().toSeq
    val toks = TextAnalysis.tokens(col("text"))
    val rows = docs.select(
        BpeExprs.encodeCount(toks, Nil).as("n0"),
        BpeExprs.encodeCount(toks, table.take(1)).as("n1"),
        BpeExprs.encodeCount(toks, table.take(4)).as("n4"),
        BpeExprs.encodeCount(toks, table).as("n8"))
      .as[(Long, Long, Long, Long)].collect().toSeq
    rows.foreach { case (n0, n1, n4, n8) =>
      assert(n8 <= n4 && n4 <= n1 && n1 <= n0, s"not nested: $rows")
    }
    // the full table strictly compresses somewhere
    assert(rows.map(_._4).sum < rows.map(_._1).sum)
    // 1-rule point = chars minus greedy non-overlapping occurrences of
    // the first pair, via an INDEPENDENT literal String.replace (the
    // same left-to-right non-overlap the SQL oracle's replace() uses)
    val (l, r) = table.head
    val pair = l + r
    val expected1 = docs.select(TextAnalysis.tokens(col("text")).as("tk"))
      .as[Seq[String]].collect()
      .map(_.map(tok => (tok.length + tok.replace(pair, "").length) / 2).sum.toLong)
      .sum
    assert(rows.map(_._2).sum === expected1)
  }

  test("QualityClassifier separates planted junk from clean docs; gate booleans hold") {
    val pos = (1L to 30L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 130L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val gate = QualityClassifier.trainGate(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 40, lr = 2.0)
      .collect()(0)
    assert(gate.getAs[Long]("n_pos") === 30L)
    assert(gate.getAs[Long]("n_neg") === 30L)
    assert(gate.getAs[Long]("n_weights") === 512L)
    assert(gate.getAs[Boolean]("acc_ok"), "training accuracy below gate")
    assert(gate.getAs[Boolean]("loss_ok"), "log-loss no better than the zero model")
    // the scorer is a pure map usable on unseen rows: junk marker drives
    // the margin down on a fresh doc too
    val model = QualityClassifier.fit(pos, neg, col("doc_id"), col("text"),
      buckets = 512, iters = 40, lr = 2.0)
    val fresh = Seq(
      (900L, "a perfectly clean document number nine hundred with enough ordinary tokens here"),
      (901L, "zxq wvv zxq wvv junkmarker zxq wvv junkmarker")).toDF("doc_id", "text")
    val scores = QualityClassifier.score(fresh, col("doc_id"), col("text"), model)
      .select("doc_id", "predicted").as[(Long, Boolean)].collect().toMap
    assert(scores(900L) && !scores(901L), s"got $scores")
    graft.CachePool.releaseAll()
  }

  test("fit bounds an oversized training frame by deterministic hash sampling") {
    val pos = (1L to 60L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 160L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    // 120 docs > maxTrainDocs=40 → the guard takes the sampled path; the
    // subset is a pure function of each doc's bucket array, so two fits
    // see the SAME subset. Weights are compared at ulp tolerance only —
    // treeAggregate's IEEE merge order is not bit-stable — but a
    // DIFFERENT subset would move them by whole percents, not ulps.
    def fitOnce() = QualityClassifier.fit(pos, neg, col("doc_id"), col("text"),
      buckets = 512, iters = 40, lr = 2.0, maxTrainDocs = 40L)
    val m1 = fitOnce()
    val m2 = fitOnce()
    assert(math.abs(m1.bias - m2.bias) < 1e-9)
    m1.w.indices.foreach { i =>
      assert(math.abs(m1.w(i) - m2.w(i)) < 1e-9,
        s"weight $i: ${m1.w(i)} vs ${m2.w(i)} — sampled subsets differ")
    }
    // the hash-selected subset keeps both classes, so the model still
    // separates the planted junk marker on unseen rows
    val fresh = Seq(
      (900L, "a perfectly clean document number nine hundred with enough ordinary tokens here"),
      (901L, "zxq wvv zxq wvv junkmarker zxq wvv junkmarker")).toDF("doc_id", "text")
    val scores = QualityClassifier.score(fresh, col("doc_id"), col("text"), m1)
      .select("doc_id", "predicted").as[(Long, Boolean)].collect().toMap
    assert(scores(900L) && !scores(901L), s"got $scores")
    graft.CachePool.releaseAll()
  }

  test("calibrationGate: junk-heavy bottom bins, clean top bins, monotone rate") {
    val pos = (1L to 30L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 130L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val got = QualityClassifier.calibrationGate(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 40, lr = 2.0, bins = 6)
      .select("bin", "n_docs", "n_pos", "rate_monotone_ok")
      .as[(Long, Long, Long, Boolean)].collect().toList
    // 60 docs into 6 rank bins of 10; strict separation ⇒ the bottom 3
    // bins are all-junk (ascending margin), the top 3 all-clean.
    assert(got === List(
      (1L, 10L, 0L, true), (2L, 10L, 0L, true), (3L, 10L, 0L, true),
      (4L, 10L, 10L, true), (5L, 10L, 10L, true), (6L, 10L, 10L, true)))
    graft.CachePool.releaseAll()
  }

  test("reliabilityGate: same bins as calibration, honest probabilities pass") {
    val pos = (1L to 30L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 130L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val got = QualityClassifier.reliabilityGate(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 40, lr = 2.0, bins = 6)
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toList
    graft.CachePool.releaseAll()
    // integer columns identical to calibrationGate's binning; with the
    // saturated margins this corpus trains to, σ tracks the rate in
    // every bin and the n-weighted gap mean stays under the ECE bound
    assert(got.map(r => (r._1, r._2, r._3)) ===
      List((1L, 10L, 0L), (2L, 10L, 0L), (3L, 10L, 0L),
        (4L, 10L, 10L), (5L, 10L, 10L), (6L, 10L, 10L)))
    assert(got.forall(_._5), s"ECE certificate failed: $got")
    assert(got.forall(_._4), s"per-bin gap certificate failed: $got")
  }

  test("reliabilityGate: a deliberately mis-scaled model fails the gates") {
    // score with margins ÷ far from calibration: train normally but bin
    // with a cold model (1 iteration — probabilities hover near 0.5
    // while rates are 0/1) — the diagram leaves the diagonal and the
    // booleans must catch it
    val pos = (1L to 30L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 130L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val got = QualityClassifier.reliabilityGate(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 1, lr = 0.05, bins = 6)
      .as[(Long, Long, Long, Boolean, Boolean)].collect().toList
    graft.CachePool.releaseAll()
    // an uncalibrated scorer must not pass everywhere: at least one gap
    // bound or the ECE bound trips
    assert(got.exists(r => !r._4) || got.exists(r => !r._5),
      s"uncalibrated model passed the reliability gates: $got")
  }

  test("calibrationGate: uneven n spreads remainders per the ceil arithmetic") {
    // 7 docs, 3 bins: k-intervals [0,3) [3,5) [5,7) ⇒ sizes 3,2,2
    val pos = (1L to 4L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 103L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val got = QualityClassifier.calibrationGate(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 40, lr = 2.0, bins = 3)
      .select("bin", "n_docs", "n_pos").as[(Long, Long, Long)].collect().toList
    // ceil((b+1)·7/3) − ceil(b·7/3) = 3,2,2; negatives fill ranks 1-3
    assert(got === List((1L, 3L, 0L), (2L, 2L, 2L), (3L, 2L, 2L)))
    graft.CachePool.releaseAll()
  }

  test("subword features: trainGate separates junk through the BPE symbol stream") {
    val pos = (1L to 30L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 130L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val table = Vocab.bpeMerges(pos, col("doc_id"), col("text"),
        topWords = 100, nMerges = 30)
      .select("left", "right").as[(String, String)].collect().toSeq
    val sub: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      tc => graft.functions.BpeExprs.encodeSymbols(TextAnalysis.tokens(tc), table)
    val gate = QualityClassifier.trainGate(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 40, lr = 2.0, tokensOf = sub)
      .collect()(0)
    assert(gate.getAs[Long]("n_pos") === 30L)
    assert(gate.getAs[Long]("n_neg") === 30L)
    assert(gate.getAs[Boolean]("acc_ok"), "subword training accuracy below gate")
    assert(gate.getAs[Boolean]("loss_ok"))
    graft.CachePool.releaseAll()
  }

  test("trainGateHoldout: the junk signal generalizes to the unseen hash split") {
    val pos = (1L to 60L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here")).toDF("doc_id", "text")
    val neg = (101L to 160L).map(i =>
      (i, s"a perfectly clean document number $i with enough ordinary tokens here " +
        "zxq wvv zxq wvv junkmarker")).toDF("doc_id", "text")
    val gate = QualityClassifier.trainGateHoldout(pos, neg, col("doc_id"), col("text"),
        buckets = 512, iters = 40, lr = 2.0)
      .collect()(0)
    assert(gate.getAs[Long]("n_pos") === 60L)
    assert(gate.getAs[Long]("n_neg") === 60L)
    assert(gate.getAs[Boolean]("acc_train_ok"))
    assert(gate.getAs[Boolean]("acc_test_ok"), "held-out accuracy below gate")
    graft.CachePool.releaseAll()
  }

  test("survivorsFromLabeled equals an independent window argmax over the labeled frame") {
    val docs = Seq(
      (1L, "!!! ??? %%% ..."),
      (2L, "the cat is on the mat and happy today"),
      (3L, "zzz qqq"),
      (10L, "a plain doc here")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val labeled = DocPipeline.clusterLabeled(docs, col("doc_id"), col("text"), pairs)
      .cache()
    val viaTopK = DocPipeline.survivorsFromLabeled(labeled)
      .select("comp", "doc_id", "quality_score").collect().toSet
    // independent semantics: plain rank-1 window, same ordering contract
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("comp").orderBy(col("quality_score").desc, col("doc_id"))
    val viaWindow = labeled
      .withColumn("rk", row_number().over(w)).filter(col("rk") === 1)
      .select("comp", "doc_id", "quality_score").collect().toSet
    labeled.unpersist()
    assert(viaTopK === viaWindow)
  }

  test("minhash-closure survivors resolve planted near-dup pairs to one doc") {
    import graft.dedup.MinHashLsh
    val docs = table("documents")
    val planted = DedupData.withPlantedDups(docs)
    val pairs = MinHashLsh.nearDuplicates(planted, col("doc_id"), col("text"))
    val labeled = DocPipeline.clusterLabeled(
      planted, col("doc_id"), col("text"), pairs.select("id_a", "id_b"))
    val surv = DocPipeline.survivorsFromLabeled(labeled)
      .select("doc_id").as[Long].collect().toSet
    graft.CachePool.releaseAll()
    val nearIds = docs.filter(col("doc_id") % 5 === 0)
      .select("doc_id").as[Long].collect().toSet
    val both = nearIds.filter(i =>
      surv.contains(i) && surv.contains(i + DedupData.NearIdOffset))
    assert(both.size <= nearIds.size / 10,
      s"${both.size} of ${nearIds.size} planted pairs kept BOTH members")
  }

  test("pmiBigrams ranks the exclusive pair above the promiscuous one") {
    // "alpha beta" always co-occur and appear nowhere else (lift = N/n_ab
    // maximal); "the end" co-occurs as often, but "the" is everywhere, so
    // its lift divides away. 12 docs of 4 tokens each: N = 48.
    val docs = (1 to 12).map(i => s"alpha beta the w$i").toDF("text")
    val got = graft.text.Collocations.pmiBigrams(docs, col("text"),
        minCount = 2L, k = 10)
      .select("a", "b", "n_ab", "n_a", "n_b", "lift")
      .as[(String, String, Long, Long, Long, Double)].collect()
    val ab = got.find(r => r._1 == "alpha" && r._2 == "beta").get
    assert(ab._3 === 12L && ab._4 === 12L && ab._5 === 12L)
    assert(ab._6 === 48.0 * 12 / (12.0 * 12)) // n_ab·N / (n_a·n_b) = 4
    val bt = got.find(r => r._1 == "beta" && r._2 == "the").get
    assert(bt._6 === 48.0 * 12 / (12.0 * 12)) // "the" df=12 here too
    // a genuinely promiscuous token dilutes: pair ("the", w_i) misses
    // minCount (each w_i appears once), so no sub-threshold rows leak
    assert(got.forall(_._3 >= 2L))
    // deterministic order: lift desc, then (a, b)
    val lifts = got.map(_._6).toSeq
    assert(lifts === lifts.sorted(Ordering[Double].reverse))
  }
}
