package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

/** Physical-plan audits: the properties that make these operators survive
  * a 100 TB scale-up. Checked on the real sf0.001 tables so the plans are
  * the ones Catalyst actually picks.
  */
class PlanAuditSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def q(name: String): DataFrame = SparkEntry.queries(name)(spark, Sf)

  private def finalPlan(df: DataFrame): SparkPlan = {
    // collect() executes THIS DataFrame's QueryExecution (a write would
    // clone it and leave this one un-finalized under AQE)
    df.collect()
    df.queryExecution.executedPlan
  }

  test("q_ingest_project pushes the filter and prunes columns at the scan") {
    val formatted = q("q_ingest_project").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters: ["), formatted)
    assert(formatted.contains("l_quantity"), formatted)
    // pruned read schema: only the 3 selected columns reach the scan
    assert(!formatted.contains("l_extendedprice"), formatted)
  }

  test("q_pricing_summary pushes the shipdate filter to the parquet scan") {
    val formatted = q("q_pricing_summary").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      formatted)
  }

  test("hot-path queries run inside WholeStageCodegen spans") {
    Seq("q_pricing_summary", "q_quality_score", "q_clean_validate").foreach { name =>
      val plan = finalPlan(q(name)) // AQE only annotates codegen once finalized
      // codegen'd operators print with a "*(id)" prefix in the final plan
      assert(plan.toString.contains("*("), s"$name has no codegen span:\n$plan")
    }
  }

  test("q_join_enrich joins dims by broadcast, never cartesian") {
    val plan = finalPlan(q("q_join_enrich"))
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty)
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_dedup_minhash band join is an equi-join (no cartesian product)") {
    val plan = finalPlan(q("q_dedup_minhash"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_knn_lsh bucket join is an equi-join (no cartesian product)") {
    val plan = finalPlan(q("q_knn_lsh"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_revenue_topn ends in a bounded TakeOrdered, not a global sort") {
    val plan = finalPlan(q("q_revenue_topn"))
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
  }

  test("q_topk_filter plans as TakeOrderedAndProject") {
    val plan = finalPlan(q("q_topk_filter"))
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
  }

  test("prefix-filtered gram queries stay equi-join shaped (no cartesian, no BNL)") {
    Seq("q_dedup_containment", "q_ngram_jaccard").foreach { name =>
      val plan = finalPlan(q(name))
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"$name plans a cartesian product")
      assert(collect(plan) {
        case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
      }.isEmpty, s"$name plans a broadcast nested loop")
    }
  }

  test("q_dedup_embedding buckets once: the banded frame is cache-reused across join sides") {
    val plan = finalPlan(q("q_dedup_embedding"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // CachePool persists the 4-round banded frame; both boundedSelfPairs
    // sides and the key histogram must read the cache, not re-bucket.
    val cacheScans = collect(plan) {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => s
    }
    assert(cacheScans.size >= 2,
      s"expected the banded frame cache-scanned on both join sides:\n$plan")
  }

  test("q_dedup_clusters propagation rounds are equi-joins over the cached edge list") {
    val plan = finalPlan(q("q_dedup_clusters"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_pii_redact is a pure map: no shuffle except the output order") {
    val plan = finalPlan(q("q_pii_redact"))
    val exchanges = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // exactly the range-partition for the final orderBy, nothing else
    assert(exchanges.size <= 1, s"redaction must not shuffle:\n$plan")
  }

  test("q_decontaminate probes by broadcast: the corpus side never shuffles before the join") {
    val plan = finalPlan(q("q_decontaminate"))
    // eval gram set broadcast-built, corpus map-side probed
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty, plan.toString)
    // shuffles: only the post-hit distinct-agg exchanges and the output
    // order — none may sit between the corpus scan and the join.
    val joins = collect(plan) { case j: BroadcastHashJoinExec => j }
    val corpusSideShuffles = joins.flatMap(j => collect(j.left) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    })
    assert(corpusSideShuffles.isEmpty,
      s"corpus side must reach the broadcast probe shuffle-free:\n$plan")
  }

  test("quota queries bound per-key rows with TopKPerKey partial before the exchange") {
    Seq("q_source_quota", "q_curation_quota").foreach { name =>
      val plan = finalPlan(q(name))
      val str = plan.toString
      // two TopKPerKey operators: partial (map-side) + final (post-shuffle)
      assert("TopKPerKey".r.findAllIn(str).size >= 2,
        s"$name must plan partial+final TopKPerKey:\n$str")
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    }
  }

  test("q_seq_pack's only global window is over the partition-totals frame") {
    val plan = finalPlan(q("q_seq_pack"))
    graft.CachePool.releaseAll()
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // every window either partitions by a key (grp-local numbering /
    // per-__pid running totals) or runs over the #partitions-row totals
    // frame; none may partition the DATA globally. The totals-frame global
    // window's child is the tiny per-__pid aggregate — assert the window
    // count is bounded and at most one is unpartitioned.
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"at most the totals-frame window may be global:\n$plan")
  }

  test("q_group_quantiles_sketch aggregates partially map-side; no per-group sort") {
    val plan = finalPlan(q("q_group_quantiles_sketch"))
    graft.CachePool.releaseAll()
    val str = plan.toString
    // the sketch is a mergeable aggregate: a partial pass must run before
    // the exchange (ObjectHashAggregate partial_percentile_approx)
    assert(str.contains("percentile_approx"), str)
    assert(str.contains("partial_percentile_approx"),
      s"sketch must partial-aggregate map-side:\n$str")
    // never the exact form's per-group sort of data rows
    assert(!str.contains("percentile("), s"exact percentile crept in:\n$str")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_shared_runs excludes boilerplate keys via broadcast anti-join, no extra shuffle") {
    val plan = finalPlan(q("q_shared_runs"))
    graft.CachePool.releaseAll()
    // the cold path's hot/boilerplate-key exclusion is a broadcast
    // left_anti (the key-count frame is tiny); the pair join itself stays
    // equi-join shaped
    assert(plan.toString.contains("LeftAnti, BuildRight"), plan.toString)
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_boilerplate_runs is one count-aggregate over the exploded frame") {
    val plan = finalPlan(q("q_boilerplate_runs"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // no join anywhere: explode → partial agg → exchange → final agg
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"side channel must be join-free:\n$plan")
  }

  test("Catalyst injects a runtime bloom filter into a selective shuffle join") {
    // The engine leans on InjectRuntimeFilter for fact⋈filtered-dim joins:
    // the dim side's bloom filter prunes fact rows BEFORE the shuffle. The
    // size thresholds exist for real clusters; lower them to demonstrate
    // the rewrite on test-scale data, and restore afterwards.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val lineitem = table("lineitem")
      val supplier = table("supplier").filter(col("s_acctbal") > 9000) // selective dim
      val joined = lineitem.join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"))
        .groupBy("s_suppkey").agg(sum("l_quantity"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        s"expected a runtime bloom filter (might_contain) in:\n$optimized")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("q_ndv_sketch HLL aggregate partial-merges map-side") {
    val plan = finalPlan(q("q_ndv_sketch"))
    val str = plan.toString
    assert(str.contains("partial_approx_count_distinct"),
      s"HLL sketch must partial-aggregate before the exchange:\n$str")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_chunk_dedup df-attach is an equi-join; rebuild has no window or global sort") {
    val plan = finalPlan(q("q_chunk_dedup"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"chunk dedup must not window over the corpus:\n$plan")
  }

  test("q_filter_funnel decontamination stage probes map-side (no corpus-eval join)") {
    val plan = finalPlan(q("q_filter_funnel"))
    graft.CachePool.releaseAll()
    // the contamination flag is the native sorted binary-search probe over
    // a task-local literal array — the corpus never joins the eval side
    assert(plan.toString.contains("sortedlongcontainsany") ||
      plan.toString.toLowerCase.contains("containsany"),
      s"expected the native sorted-probe expression in:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_temperature_mix bounds the corpus with TopKPerKey before any window") {
    val plan = finalPlan(q("q_temperature_mix"))
    graft.CachePool.releaseAll()
    val str = plan.toString
    // the per-source rank window must sit above the TopKPerKey cap, so
    // every corpus-sized window partition is bounded by the max target
    assert("TopKPerKey".r.findAllIn(str).size >= 2,
      s"selection must cap per-source rows map-side first:\n$str")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_topic_clusters assignment is a pure map: no join over the corpus") {
    val plan = finalPlan(q("q_topic_clusters"))
    graft.CachePool.releaseAll()
    // centroids ride along as literals; the only joins are the 1-row
    // summary crossJoins (BNLJ over single rows)
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, s"assignment must not join the corpus:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_oov_rate vocabulary membership is one equi-join enrichment") {
    val plan = finalPlan(q("q_oov_rate"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"membership must be an equi-join, never BNL:\n$plan")
  }

  test("q_bloom_dedup probes map-side and confirms by broadcast; snapshot never shuffles") {
    val df = q("q_bloom_dedup")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("might_contain"),
      s"expected the bloom membership probe in:\n$optimized")
    val plan = finalPlan(df)
    graft.CachePool.releaseAll()
    // the only joins over data-sized frames are broadcast hash joins (the
    // confirm probe); the 1-row summary crossJoins plan as BNLJ over
    // single rows, which is fine
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, s"snapshot-side confirm must broadcast, not shuffle:\n$plan")
  }

  test("q_vocab_topk caps with TakeOrdered and partial-aggregates map-side; no vocab sort") {
    val plan = finalPlan(q("q_vocab_topk"))
    assert(plan.toString.contains("TakeOrderedAndProject"), plan.toString)
    // the only Sort nodes permissible are inside TakeOrdered's per-partition
    // bound — a standalone global SortExec over the vocab is the scale bug
    assert(collect(plan) {
      case s: org.apache.spark.sql.execution.SortExec if s.global => s
    }.isEmpty, s"global sort over the vocabulary:\n$plan")
  }

  test("q_token_mix caps the fill with TopKPerKey before the per-source cumsum window") {
    val plan = finalPlan(q("q_token_mix"))
    graft.CachePool.releaseAll()
    val str = plan.toString
    // same contract as q_temperature_mix: the running-total window only
    // ever sees the TopKPerKey-capped frame (≤ max target_tokens rows per
    // source), never the raw corpus
    assert("TopKPerKey".r.findAllIn(str).size >= 2,
      s"token fill must cap per-source rows map-side first:\n$str")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_dsir_select: hot-set join broadcasts; per-doc count is a partial agg, no window") {
    val plan = finalPlan(q("q_dsir_select"))
    graft.CachePool.releaseAll()
    // the gram→hot membership attach must broadcast the ≤ B-row hot set,
    // never shuffle the gram frame against it as a sort-merge join; the
    // only BNLJ/cross shapes permissible are the 1-row totals attaches
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"hot-bucket membership must be a broadcast hash join:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // no window anywhere: doc scoring is groupBy partial aggregation
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"DSIR scoring must not window the gram frame:\n$plan")
  }

  test("q_lm_score count enrichment is one equi-join, never BNL or cartesian") {
    val plan = finalPlan(q("q_lm_score"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"count attach must be an equi-join, never BNL:\n$plan")
  }

  test("q_classifier_calibration ranks via the range-sort shape, bounded global windows") {
    val plan = finalPlan(q("q_classifier_calibration"))
    graft.CachePool.releaseAll()
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // permissible unpartitioned windows: the reindexScalable offsets
    // frame (#partitions rows) and the monotonicity lag over the ≤bins-row
    // aggregate — never a corpus-wide single-partition rank
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 2,
      s"only the offsets and mono-cert windows may be global:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_cbo_broadcast: ANALYZE stats flip the join strategy (both shapes pinned)") {
    // the gate row derives its booleans from the two physical plans at
    // runtime; this audit pins them TRUE at spec scale so a regression
    // in stats propagation (or the self-calibrating threshold) fails CI
    // before the driver grades it
    val row = q("q_cbo_broadcast").collect().head
    assert(row.getBoolean(row.fieldIndex("stats_shrink_estimate")),
      "ANALYZE stats must shrink the filtered-dim size estimate")
    assert(row.getBoolean(row.fieldIndex("smj_without_stats")),
      "without stats the join must plan as sort-merge")
    assert(row.getBoolean(row.fieldIndex("bhj_with_stats")),
      "with stats the join must plan as broadcast")
  }

  test("q_shuffle_order ranks via the range-sort shape, not a corpus-wide window") {
    val plan = finalPlan(q("q_shuffle_order"))
    graft.CachePool.releaseAll()
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // reindexScalable: the within-partition numbering windows on __pid;
    // the only permissible unpartitioned window is the #partitions-row
    // offsets frame — never the corpus itself
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"only the offsets window may be global:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_auc: prefix in the range-sort shape, never a corpus-wide rank window") {
    val plan = finalPlan(q("q_auc"))
    graft.CachePool.releaseAll()
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // aucExact: the per-partition running sum windows on __pid; the only
    // permissible unpartitioned window is the #partitions-row offsets
    // frame — never a rank over the scored corpus
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1,
      s"only the offsets window may be global:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_gopher_filters and q_gopher_ngrams are stateless projections (no shuffle before the sort)") {
    Seq("q_gopher_filters", "q_gopher_ngrams").foreach { name =>
      val plan = finalPlan(q(name))
      graft.CachePool.releaseAll()
      // the only exchange allowed is the final presentation sort's range
      // partitioning; the flags themselves must be per-row projections
      val exchanges = collect(plan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.forall(_.outputPartitioning.toString.contains("range")),
        s"$name shuffles beyond the output sort:\n$plan")
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"$name must not window:\n$plan")
    }
  }

  test("q_unimax_mix reduces to per-source counts; the waterfill never windows the corpus") {
    val plan = finalPlan(q("q_unimax_mix"))
    graft.CachePool.releaseAll()
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"the waterfill folds in-row, no window belongs here:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_ccnet_buckets windows are per-language only") {
    val plan = finalPlan(q("q_ccnet_buckets"))
    graft.CachePool.releaseAll()
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      s"CCNet terciles must partition by lang, never globally:\n$plan")
  }

  test("q_event_funnel: one user-keyed exchange, no per-step event-log re-join") {
    val plan = finalPlan(q("q_event_funnel"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // one scan of the event log — the chained-join funnel would scan
    // once per step
    val scans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size <= 1, s"per-step re-scans of the event log:\n$plan")
  }

  test("q_gap_fill and q_moving_window: every window is key-partitioned") {
    Seq("q_gap_fill", "q_moving_window").foreach { name =>
      val plan = finalPlan(q(name))
      graft.CachePool.releaseAll()
      val windows = collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
        s"$name has a global window:\n$plan")
    }
  }

  test("q_cube_stats expands all four grouping sets before ONE exchange") {
    val plan = finalPlan(q("q_cube_stats"))
    assert(plan.toString.contains("Expand"), plan.toString)
    val scans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size <= 1, s"one scan per grouping set:\n$plan")
  }

  test("q_keyset_page: cursors broadcast onto the corpus; TopKPerKey caps; no global window") {
    val plan = finalPlan(q("q_keyset_page"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // the cursor attach must be a broadcast join, never a corpus shuffle
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty, s"$plan")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty, s"keyset pagination must not rank-window the corpus:\n$plan")
    assert(plan.toString.contains("TopKPerKey"), s"$plan")
  }

  test("q_snapshot_diff is one full-outer equi-join over (id, hash) projections") {
    val plan = finalPlan(q("q_snapshot_diff"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.isEmpty, s"non-equi join in the snapshot diff:\n$plan")
  }

  test("q_partition_prune: the partition-key filter prunes at the scan") {
    val df = q("q_partition_prune")
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    // the read of the partitioned roundtrip table must carry partition
    // filters — a scan of all five event_type partitions would have none
    assert(scans.exists(_.partitionFilters.nonEmpty),
      s"no partition pruning:\n${df.queryExecution.executedPlan}")
    // and the data filter must NOT appear as a post-scan Filter on the
    // partition column (pruning replaces it)
    val pruned = scans.filter(_.partitionFilters.nonEmpty)
    assert(pruned.forall(_.relation.partitionSchema.fieldNames.contains("event_type")))
  }

  test("q_tile_topk caps per cell with TopKPerKey, no window over houses") {
    val plan = finalPlan(q("q_tile_topk"))
    assert(plan.toString.contains("TopKPerKey"), s"$plan")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    // the reindex inside the houses derivation owns the only windows;
    // the spatial argmax itself must not add one
    assert(windows.forall(_.partitionSpec.nonEmpty) || windows.size <= 1,
      s"unexpected windows:\n$plan")
  }

  test("q_top_sessions caps with TakeOrdered after per-user session windows") {
    val plan = finalPlan(q("q_top_sessions"))
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"global sort instead of a bounded top-k:\n$plan")
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"sessionize window must stay user-partitioned:\n$plan")
  }

  test("q_knn_filtered applies the label predicate inside the candidate join") {
    val plan = finalPlan(q("q_knn_filtered"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // the predicate must be a KEY of the candidate equi-join (cell AND
    // label) — post-filtering a fixed top-k would starve filtered
    // queries (VERDICT r17 item 3)
    val joins = collect(plan) { case j: BroadcastHashJoinExec => j }
    assert(joins.exists { j =>
      val keys = j.leftKeys.map(_.toString).mkString(",")
      keys.contains("cell") && keys.contains("label")
    }, s"label is not a candidate-join key:\n$plan")
  }

  test("q_graph_filtered builds label-aware edges by equi-join, never cartesian") {
    val plan = finalPlan(q("q_graph_filtered"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, plan.toString)
  }

  test("q_path_topk caps the path rank with TakeOrdered; rank window input is bounded") {
    val plan = finalPlan(q("q_path_topk"))
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"global sort instead of a bounded top-k over the path vocabulary:\n$plan")
    // the session windows stay user-partitioned; the only unpartitioned
    // window is the k-row rank derivation, whose subtree must contain the
    // TakeOrdered that bounds its input (VERDICT r17 item 2)
    val windows = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      assert(w.toString.contains("TakeOrderedAndProject"),
        s"unpartitioned rank window over an unbounded input:\n$plan")
    }
  }

  test("q_snapshot_dedup and q_drift stay equi-join shaped over the snapshots") {
    Seq("q_snapshot_dedup", "q_drift").foreach { name =>
      val plan = finalPlan(q(name))
      graft.CachePool.releaseAll()
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, name)
      // permissible BNLs: only the bounded 1-row gate/totals attaches
      val bnl = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }
      assert(bnl.size <= 1, s"$name has corpus-sized non-equi joins:\n$plan")
    }
  }

  test("q_dedup_incr bands meet in a two-sided equi-join, never cartesian/BNL over docs") {
    val plan = finalPlan(q("q_dedup_incr"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // the only BNLs are the 1-row planted-count broadcasts of the gate
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 2, s"corpus-sized BNL in the cross-snapshot join:\n$plan")
  }

  test("q_semdedup pairs within clusters by equi-join; no cartesian over the corpus") {
    val plan = finalPlan(q("q_semdedup"))
    graft.CachePool.releaseAll()
    // cluster blocking + triangle tiling: the pair space is an equi-join
    // on the cluster (or tiled cell) key, never an all-pairs product;
    // the only BNLs are the 1-row gate-summary crossJoins
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"semdedup must never plan an all-pairs product:\n$plan")
    assert(plan.toString.contains("TopKPerKey"),
      s"survivor argmin must run through bounded heaps:\n$plan")
  }

  test("q_tfidf_incr merges df by equi-join; TopKPerKey caps; no cartesian") {
    val plan = finalPlan(q("q_tfidf_incr"))
    graft.CachePool.releaseAll()
    val str = plan.toString
    // bounded heaps partial+final, like the batch tfidf path
    assert("TopKPerKey".r.findAllIn(str).size >= 2,
      s"incremental tfidf must cap per-doc rows map-side first:\n$str")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // the only BNL is the broadcast of the 1-row merged corpus count
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 1, s"only the 1-row n_docs broadcast may BNL:\n$plan")
  }

  test("q_margin_quota selection caps with TopKPerKey; scoring joins nothing corpus-sized") {
    val plan = finalPlan(q("q_margin_quota"))
    graft.CachePool.releaseAll()
    val str = plan.toString
    // the margin rank is a TopKPerKey bounded-heap cap (the only global
    // sort is the output orderBy over the per-source aggregate — ≤ one
    // row per source); the model rides inside BucketDot, so scoring
    // adds no join over the corpus
    assert("TopKPerKey".r.findAllIn(str).size >= 2,
      s"margin quota must cap per-source rows map-side first:\n$str")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }.isEmpty, s"scoring must not shuffle-join the corpus:\n$plan")
  }

  test("q_minhash_survivors: no cartesian over data-sized frames; labeled frame cache-reused") {
    val df = q("q_minhash_survivors")
    val plan = finalPlan(df)
    graft.CachePool.releaseAll()
    // the closure rounds, argmax and gate joins are all equi-joins; the
    // only non-equi joins are the 1-row summary crossJoins (BNLJ is fine)
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"cartesian over a data-sized frame:\n$plan")
    // the persisted labeled frame feeds BOTH the argmax selection and the
    // cluster-max replay without recomputing the closure
    val cacheScans = collect(plan) {
      case c: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec => c
    }
    assert(cacheScans.size >= 2,
      s"labeled frame must be cache-reused across argmax and gate:\n$plan")
  }

  test("AQE splits a planted hot fact-fact key into skewed partition sub-reads") {
    // SURVEY §5's skew claim, made driver-visible: a fact-fact shuffle
    // join whose hot key dwarfs the median partition must come out of
    // AQE's OptimizeSkewedJoin as a skew-split join (isSkewJoin=true),
    // i.e. the hot partition is read as multiple sub-partitions instead
    // of one straggler task. Thresholds are lowered so sf-test volumes
    // trip the same code path a 100 TB hot key would.
    import org.apache.spark.sql.functions.{concat, count, length, lit, max, when}
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // 16 map partitions so the hot reduce partition is splittable at
      // map-output granularity; 5/6 of the left lands on key 0.
      val hot = spark.range(0, 120000, 1, 16)
        .select(when(col("id") % 6 =!= 0, lit(0L)).otherwise(col("id") % 500).as("k"),
          concat(lit("padpadpadpadpadpadpadpad_"), col("id")).as("payload"))
      val dim = spark.range(0, 500, 1, 4).select(col("id").as("k"), (col("id") * 3).as("rv"))
      // GLOBAL aggregate downstream: a groupBy on the join key would
      // reuse the join's hash distribution and AQE would (correctly)
      // refuse to split the skewed partition; a global agg has no
      // distribution requirement, so the split is legal. max(length)
      // keeps the fat payload flowing through the left shuffle.
      val joined = hot.join(dim, "k")
        .agg(count(lit(1)).as("n"), max(length(col("payload"))).as("max_len"))
      val plan = finalPlan(joined)
      val skewJoins = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec if j.isSkewJoin => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewJoins.nonEmpty, s"no skew-split join in the adaptive plan:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_url_stats scan reads ONLY doc_id (planted URLs derive from it, text never loads)") {
    val formatted = q("q_url_stats").queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("doc_id"), formatted)
    // column pruning: the wide text column must not reach the scan
    assert(!formatted.contains("ReadSchema: struct<doc_id:bigint,text"), formatted)
    assert(!formatted.contains("text:string"), formatted)
  }

  test("q_blocklist gate is a broadcast anti-join: the corpus side never shuffles for it") {
    val plan = finalPlan(q("q_blocklist"))
    val antiBroadcast = collect(plan) {
      case j: BroadcastHashJoinExec
        if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti => j
    }
    assert(antiBroadcast.nonEmpty, s"expected a broadcast LEFT ANTI join:\n$plan")
  }

  test("q_stratified_sample and q_bm25 plan without Window operators (bounded heaps instead)") {
    Seq("q_stratified_sample", "q_bm25").foreach { name =>
      val plan = finalPlan(q(name))
      assert(collect(plan) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"$name must rank via TopKPerKey, not a window:\n$plan")
    }
  }

  test("q_dpp_prune: the dim filter reaches the fact scan as a dynamic pruning subquery") {
    val df = q("q_dpp_prune")
    df.collect()
    val scans = collect(df.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    // the region-partitioned fact scan must carry a dynamicpruning
    // partition filter — a static plan would read all 25 region
    // partitions and filter after the join
    val fact = scans.filter(_.relation.partitionSchema.fieldNames.contains("region"))
    assert(fact.nonEmpty, s"no partitioned fact scan:\n${df.queryExecution.executedPlan}")
    assert(fact.exists(_.partitionFilters.exists(
        _.toString.toLowerCase(java.util.Locale.ROOT).contains("dynamicpruning"))),
      s"fact scan has no dynamic pruning filter:\n${df.queryExecution.executedPlan}")
  }

  test("q_geo_join: cell blocking keeps the distance join an equi-join") {
    val plan = finalPlan(q("q_geo_join"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"distance join degenerated to a cartesian product:\n$plan")
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"distance join is a nested-loop join:\n$plan")
  }

  test("q_runtime_filter: the dim filter reaches the fact side as a bloom probe") {
    val df = q("q_runtime_filter")
    df.collect()
    val formatted = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // InjectRuntimeFilter folded the dim's selective filter into a bloom
    // filter probed on the fact side below its shuffle
    assert(formatted.toLowerCase(java.util.Locale.ROOT).contains("bloomfilter"),
      s"no runtime bloom filter injected:\n$formatted")
    // and the injection stayed inside the query's isolated session: a
    // plain join built on the SHARED session must not carry one
    val plain = table("lineitem").join(
      table("orders").filter(col("o_orderpriority") === "1-URGENT"),
      col("l_orderkey") === col("o_orderkey"))
    assert(!plain.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      .toLowerCase(java.util.Locale.ROOT).contains("bloomfilter"))
  }

  test("q_geo_knn ranks via TopKPerKey bounded heaps, not a per-point window") {
    val plan = finalPlan(q("q_geo_knn"))
    assert(plan.toString.contains("TopKPerKey"), s"$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // the only windows allowed are inside the houses derivation's reindex;
    // the kNN ranking itself must be heap-based. housesUnindexed has no
    // reindex, so NO window may appear at all.
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_geo_knn must rank via TopKPerKey, not a window:\n$plan")
  }

  test("q_bucket_join: the join itself is exchange-free (bucketed co-located scans)") {
    // broadcast disabled so the shuffle-free join is the BUCKETING
    // effect, not a broadcast of the small test tables — at fact-fact
    // scale broadcast is off the table anyway.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = finalPlan(q("q_bucket_join"))
      val joins = collect(plan) {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(joins.nonEmpty, s"expected a sort-merge join:\n$plan")
      val shufflesBelowJoin = joins.flatMap(j => collect(j: SparkPlan) {
        case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => s
      })
      assert(shufflesBelowJoin.isEmpty,
        s"bucketed join must read both sides exchange-free, found: $shufflesBelowJoin\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("q_pagerank iterates on equi-joins over truncated lineage — no cartesian, no window") {
    val plan = finalPlan(q("q_pagerank"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"$plan")
    // per-round lineage truncation: the final round's plan reads the
    // previous round as a checkpointed RDD scan, not a 5-deep nested
    // join tree re-deriving every round from the parquet scan
    assert(collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.isEmpty, s"round plan still re-derives from the file scan:\n$plan")
  }

  test("q_cluster_split assigns splits by map + equi-joins — no window over the corpus") {
    val plan = finalPlan(q("q_cluster_split"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"$plan")
  }

  test("q_corpus_to_shards fuses curate→pack→manifest into one plan with bounded-heap quota") {
    val plan = finalPlan(q("q_corpus_to_shards"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    // the per-source quota must run through TopKPerKey bounded heaps —
    // composing the stages must not regress it to a window-rank plan
    assert(plan.toString.contains("TopKPerKey"), s"$plan")
  }

  test("q_normalize_text is a pure map: no joins, only the output-order shuffle") {
    val plan = finalPlan(q("q_normalize_text"))
    val shuffles = collect(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.size <= 1, s"fold should shuffle only for the final sort:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.isEmpty, s"unicode fold must not join:\n$plan")
  }

  test("q_pmi caps with TakeOrderedAndProject; count joins stay equi") {
    val plan = finalPlan(q("q_pmi"))
    graft.CachePool.releaseAll()
    assert(plan.toString.contains("TakeOrderedAndProject"),
      s"top-k must not global-sort:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    // the single 1-row total broadcast is the only nested-loop join
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 1, s"vocab-sized BNL in the pmi joins:\n$plan")
  }

  test("q_triangles closes wedges through equi-joins, never a cartesian") {
    val plan = finalPlan(q("q_triangles"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
  }

  test("q_span_dedup meets first-occurrences in an equi-join on the run hash") {
    val plan = finalPlan(q("q_span_dedup"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"span probe must be an equi-join:\n$plan")
  }

  test("q_profile reads the events table exactly once for all columns") {
    val plan = finalPlan(q("q_profile"))
    val scans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, s"profile must be one scan:\n$plan")
  }

  test("q_minhash_decontam bands meet in a two-sided equi-join, never cartesian over docs") {
    val plan = finalPlan(q("q_minhash_decontam"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    // the only BNL is the 1-row planted-count broadcast of the gate
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 1, s"corpus-sized BNL in the decontamination probe:\n$plan")
  }

  test("q_skyline: bucket-prune shape — one stats BNL, no cartesian, bucket-keyed windows") {
    val plan = finalPlan(q("q_skyline"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 1, s"only the 1-row stats broadcast may be a BNL:\n$plan")
    // the only unpartitioned window is the buckets-row lowmin frame
    val unpartitioned = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.size <= 1, s"only the bucket frame may window globally:\n$plan")
  }

  test("q_basket_rules: pairs never leave the basket row — no cartesian, BNLs are the 1-row count frame") {
    val plan = finalPlan(q("q_basket_rules"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 2, s"only the two threshold broadcasts may be BNLs:\n$plan")
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"frequent-item and support joins must broadcast:\n$plan")
  }

  test("q_rendezvous_shard folds in-row: no explode, no join wider than the 1-row frames") {
    val plan = finalPlan(q("q_rendezvous_shard"))
    assert(collect(plan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, s"HRW argmax must fold inside the row, not explode:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
  }

  test("q_gini ranks via the range-sort shape, not a corpus-wide window") {
    val plan = finalPlan(q("q_gini"))
    graft.CachePool.releaseAll()
    val unpartitioned = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty)
    // two giniPpm branches, each with one #partitions-row offsets window
    assert(unpartitioned.size <= 2,
      s"only the offsets windows may be global:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_funnel_strict steps join on the user key only — no cartesian, no BNL") {
    val plan = finalPlan(q("q_funnel_strict"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"step deadlines must ride the equi-join, not a range join:\n$plan")
  }

  test("q_dau_mau trailing window is one bounded BNL against the broadcast day list") {
    val plan = finalPlan(q("q_dau_mau"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    val bnl = collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }
    assert(bnl.size <= 1, s"only the day-list BETWEEN join may be a BNL:\n$plan")
  }

  test("q_ab_test touches the corpus with exactly one scan") {
    val plan = finalPlan(q("q_ab_test"))
    val scans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size === 1, s"the contingency pass must be one scan:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_release_diff: bin-grain manifest join, never cartesian") {
    val plan = finalPlan(q("q_release_diff"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_decontam_sweep sweeps all four k without re-scanning per k") {
    // the absolute pin counts FILE scans, so caches left by other suites
    // (a persisted corpus frame turns a file scan into an
    // InMemoryRelation) must not leak in — start from a cold cache
    graft.CachePool.releaseAll()
    spark.sharedState.cacheManager.clearCache()
    def scans(df: DataFrame) = collect(finalPlan(df)) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.size
    // ABSOLUTE pin (ADVICE r14): exactly the corpus arms' 3 documents
    // scans (the withPlantedDups union's three branches); the eval-gram
    // side is persisted for the broadcast-guard count (ADVICE r13) so it
    // shows as an InMemoryRelation, not a 4th file scan. The k fan-out
    // happens in the gram expression — a 4th scan means the sweep started
    // re-reading the corpus per k (or the eval persist was dropped and is
    // silently hiding an extra corpus read behind the old <= comparison).
    assert(scans(q("q_decontam_sweep")) === 3)
  }

  test("q_abc_analysis cumulates via the range-sort shape, not a global window") {
    val plan = finalPlan(q("q_abc_analysis"))
    graft.CachePool.releaseAll()
    val unpartitioned = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty)
    // only the #partitions-row offsets window may be global
    assert(unpartitioned.size <= 1, s"only the offsets window may be global:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_ivm_agg folds the delta through hash joins, never cartesian") {
    val plan = finalPlan(q("q_ivm_agg"))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty, s"$plan")
    assert(collect(plan) {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, s"the view-delta fold must be an equi-join:\n$plan")
  }

  test("q_growth_accounting and q_cohort_ltv stay keyed: no cartesian, no BNL") {
    Seq("q_growth_accounting", "q_cohort_ltv").foreach { name =>
      val plan = finalPlan(q(name))
      assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
        s"$name:\n$plan")
      assert(collect(plan) {
        case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
      }.isEmpty, s"$name must join on keys only:\n$plan")
    }
  }

  test("q_discount_lift pair join runs on the bucket frame only") {
    val plan = finalPlan(q("q_discount_lift"))
    graft.CachePool.releaseAll()
    // the bucket frame is persisted, so the corpus is scanned ONCE no
    // matter how many small-frame consumers hang off it
    val scans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size <= 1, s"corpus must be scanned once:\n$plan")
  }

  test("q_peak_concurrency sweeps via the range-sort shape, not a global window") {
    val plan = finalPlan(q("q_peak_concurrency"))
    graft.CachePool.releaseAll()
    val unpartitioned = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty)
    // the boundary cumsum windows on __pid; the only global windows are
    // the #partitions-row offsets frame, which appears once per consumer
    // of the joined sweep (the peak aggregate and the argmin filter)
    assert(unpartitioned.size <= 2, s"only the offsets windows may be global:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_cusum folds in-row: the recurrence never explodes the day arrays") {
    val plan = finalPlan(q("q_cusum"))
    // one Generate would mean the fold was rewritten as an explode
    assert(collect(plan) {
      case g: org.apache.spark.sql.execution.GenerateExec => g
    }.isEmpty, s"CUSUM must fold inside the row:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_knn_sq8: codes materialize once per side BEFORE the join; rank limit pushed") {
    val plan = finalPlan(q("q_knn_sq8"))
    graft.CachePool.releaseAll()
    // the quantize transform must sit under the join (2 projects), never
    // re-evaluated per pair — a per-pair quantize would show ≥3 FLOOR sites
    val floors = plan.toString.split("FLOOR").length - 1
    assert(floors <= 4, s"quantize must run once per side, found $floors FLOOR sites:\n$plan")
    // rank<=k runs as WindowGroupLimit (partial top-k before the exchange)
    assert(collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty, s"rank filter must push down as a group limit:\n$plan")
  }

  test("q_ivf_sq8: candidates come from a broadcast EQUI-join on cell, never all pairs") {
    val plan = finalPlan(q("q_ivf_sq8"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"probe join must be a hash equi-join on cell:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"an BNL here would mean the cell key was lost:\n$plan")
  }

  test("q_ivf_sq8_io: the from-disk serve keeps the broadcast cell equi-join shape") {
    val plan = finalPlan(q("q_ivf_sq8_io"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case j: BroadcastHashJoinExec => j }.nonEmpty,
      s"probe join over the loaded postings must be a hash equi-join on cell:\n$plan")
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty)
    assert(collect(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"a BNL here would mean the cell key was lost in the round trip:\n$plan")
  }

  test("q_knn_graph: build and traversal stay on equi-joins, never all pairs") {
    val plan = finalPlan(q("q_knn_graph"))
    graft.CachePool.releaseAll()
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"graph ANN must never fall to a cartesian:\n$plan")
    assert(collect(plan) {
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }.isEmpty, s"a BNL would mean a join key (cell/src/vec_id) was lost:\n$plan")
  }

  test("graph build takes the tiled hot-cell path: equi-joins on tile keys, no cartesian") {
    // the build-time bound VERDICT r16 named: coCellGraph routes its pair
    // enumeration through SkewJoin.boundedSelfPairs, so a hot cell tiles
    // into (cell, __c1, __c2) join keys instead of one n_c²-pair task. With
    // hotCellThreshold forced low every cell is hot — the plan must show
    // the tile keys on a hash equi-join and still no cartesian anywhere.
    val vecs = spark.read.parquet(s"$Sf/embeddings.parquet")
    val assigned = vecs.select(col("vec_id"),
      graft.similarity.IvfKnn.nearestCells(col("embedding"),
        graft.similarity.IvfKnn.IvfIndex(
          Array.tabulate(8)(j => Array.tabulate(64)(k => if (k == j) 1.0f else 0.0f))), 1)
        .getItem(0).cast("long").as("cell"),
      graft.functions.VecOps.sq8F(col("embedding"), 6).as("code"))
    val plan = finalPlan(
      graft.similarity.GraphKnn.coCellGraph(assigned, m = 4, hotCellThreshold = 8))
    assert(collect(plan) { case c: CartesianProductExec => c }.isEmpty,
      s"graph build must never fall to a cartesian:\n$plan")
    val str = plan.toString
    assert(str.contains("__c1") && str.contains("__c2"),
      s"hot cells must pair through the triangle-tile keys:\n$str")
  }

  test("q_manifest_prune: the pruned read's file index holds only selected shard dirs") {
    val plan = finalPlan(q("q_manifest_prune"))
    graft.CachePool.releaseAll()
    val prunedScans = collect(plan) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
        if s.relation.location.rootPaths.exists(_.toString.matches(".*graft_manifest_prune\\d*/shard=\\d+$"))
      => s
    }
    assert(prunedScans.nonEmpty, s"no dir-scoped pruned scan in the plan:\n$plan")
    prunedScans.foreach { s =>
      val roots = s.relation.location.rootPaths.map(_.toString)
      assert(roots.forall(_.matches(".*graft_manifest_prune\\d*/shard=\\d+$")), roots.mkString(","))
      assert(roots.size < 16, s"pruned read opened ${roots.size} of 16 shard dirs — no skipping")
    }
  }

  test("q_curriculum_order assigns the global rank via the range-sort shape") {
    val plan = finalPlan(q("q_curriculum_order"))
    graft.CachePool.releaseAll()
    val unpartitioned = collect(plan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.filter(_.partitionSpec.isEmpty)
    // the only admissible global window is reindexScalable's offsets
    // cumsum over the #partitions-row frame
    assert(unpartitioned.size <= 1,
      s"curriculum rank must never run a global window over the bin frame:\n$plan")
  }
}
