package graft

import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._

/** Plan + structure audit of the q_llm_release flagship (VERDICT r12
  * item 5): the whole release must be ONE fused plan over the corpus —
  * the corpus parquet scanned at most once per planted-union arm, every
  * downstream consumer reading the survivors persist boundary, and the
  * written manifest internally consistent (contiguous seek indexes,
  * token conservation against the curated corpus).
  */
class LlmReleaseSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  // every file relation in these plans IS the documents table (the chain
  // reads nothing else), so counting LogicalRelation leaves counts corpus
  // scans; persisted frames appear as InMemoryRelation leaves instead
  private def docScans(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r
    }.size

  test("curation chain scans the corpus parquet exactly once per planted-union arm") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = graft.dedup.DedupData.withPlantedDups(docs)
    val corpus = graft.text.DocPipeline.corpus(planted, col("doc_id"), col("text"))
    val survivors = graft.plans.TopKPerKey.topK(
      corpus.select(col("doc_id"), col("source"), col("quality_score"),
        col("n_tokens"), col("n_chars_c").as("n_chars")),
      Seq("source"), Seq(("quality_score", false), ("doc_id", true)), 25)
    // quality gate + exact dedup (window, no self-join) + quota fuse into
    // one pass over each of withPlantedDups' three union arms — a fourth
    // leaf would mean some stage re-reads the corpus. Leaves are counted
    // type-agnostically because a shared-session CacheManager may
    // substitute InMemoryRelations for corpus subtrees cached by earlier
    // suites (each still represents at most one corpus read).
    val leaves = survivors.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size <= 3, s"curation chain grew extra corpus reads:\n$leaves")
    assert(docScans(survivors) <= 3)
  }

  test("manifest plan reads the corpus only through the survivors persist boundary") {
    val manifest = SparkEntry.llmReleaseManifest(spark, sf)
    // every parquet scan sits behind the survivors cache (InMemoryRelation
    // leaves) — the pack, the byte/witness join and both prefix sums must
    // not re-touch the raw table
    assert(docScans(manifest) === 0)
  }

  test("released manifest: contiguous seek indexes, token/byte conservation, witness coverage") {
    val rows = SparkEntry.queries("q_llm_release")(spark, sf)
      .orderBy("shard_key").collect()
    assert(rows.nonEmpty)
    var tok = 0L
    var byt = 0L
    rows.foreach { r =>
      assert(r.getAs[Long]("start_offset") === tok, s"token seek gap at ${r}")
      assert(r.getAs[Long]("byte_offset") === byt, s"byte seek gap at ${r}")
      assert(r.getAs[Long]("n_docs") >= 1L)
      assert(r.getAs[Long]("shard_len") ===
        r.getAs[Long]("sum_tokens") + r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("shard_group") === r.getAs[Long]("shard_key") / 1024L)
      tok += r.getAs[Long]("shard_len")
      byt += r.getAs[Long]("byte_len")
    }
    // token conservation: the release carries exactly the curated corpus
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = graft.dedup.DedupData.withPlantedDups(docs)
    val corpus = graft.text.DocPipeline.corpus(planted, col("doc_id"), col("text"))
    val survivors = graft.plans.TopKPerKey.topK(
      corpus.select(col("doc_id"), col("source"), col("quality_score"),
        col("n_tokens")),
      Seq("source"), Seq(("quality_score", false), ("doc_id", true)), 25)
    val (nSurv, sumTok) = survivors
      .agg(count(lit(1)), sum(col("n_tokens").cast("long")))
      .as[(Long, Long)].head()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === nSurv)
    assert(rows.map(_.getAs[Long]("sum_tokens")).sum === sumTok)
  }

  test("nightly manifest reads the corpus only through the survivors persist boundary") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val planted = graft.dedup.DedupData.withPlantedDups(docs)
    // pack, the n_chars/witness join and the group-local offset window
    // must all read the survivors cache, never the raw table
    assert(docScans(SparkEntry.nightlyManifest(planted)) === 0)
  }

  test("nightly release: every unchanged group's written rows are identical across epochs") {
    // run the graded diff (also materializes both epoch sinks), then read
    // the two sink trees back and compare each 'unchanged' group's FULL
    // row set — shard keys, counts, local offsets, byte lengths, content
    // witnesses. Identity here is the whole point of packGreedyStable +
    // group-local offsets: the re-release re-ships only touched dirs.
    val diff = SparkEntry.queries("q_nightly_release")(spark, sf).collect()
    val classes = diff.map(_.getAs[String]("change")).toSet
    assert(classes === Set("added", "removed", "changed", "unchanged"),
      s"expected all four change classes, got $classes")
    val unchanged = diff.filter(_.getAs[String]("change") == "unchanged")
      .map(_.getAs[Long]("shard_group")).toSet
    assert(unchanged.nonEmpty)
    def groupRows(dir: String): Map[Long, Set[String]] = {
      val base = new java.io.File(dir)
      assert(base.isDirectory, s"sink tree missing: $dir")
      spark.read.parquet(dir)
        .select(col("shard_group").cast("long").as("g"),
          concat_ws("|", col("shard_key"), col("n_docs"), col("sum_tokens"),
            col("shard_len"), col("start_offset"), col("byte_len"),
            col("byte_offset"), col("content_xor")).as("row"))
        .as[(Long, String)].collect()
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    }
    // the scratch dirs are stable within the JVM (scratchDir caches by name)
    val a = groupRows(SparkEntry.nightlySinkA)
    val b = groupRows(SparkEntry.nightlySinkB)
    unchanged.foreach { g =>
      assert(a.contains(g) && b.contains(g), s"unchanged group $g missing from a sink")
      assert(a(g) === b(g), s"unchanged group $g differs across epochs")
    }
    // and a changed group really differs (the comparison has teeth)
    diff.filter(_.getAs[String]("change") == "changed")
      .map(_.getAs[Long]("shard_group")).headOption.foreach { g =>
        assert(a(g) !== b(g), s"changed group $g reads identical across epochs")
      }
  }

  test("media nightly: every unchanged group's written rows are identical across epochs") {
    // the media twin of the pin above — identity of untouched groups is
    // what lets a multimodal re-release ship only the touched media dirs
    val diff = SparkEntry.queries("q_media_nightly")(spark, sf).collect()
    graft.CachePool.releaseAll()
    val classes = diff.map(_.getAs[String]("change")).toSet
    assert(classes === Set("added", "removed", "changed", "unchanged"),
      s"expected all four change classes, got $classes")
    val unchanged = diff.filter(_.getAs[String]("change") == "unchanged")
      .map(_.getAs[Long]("shard_group")).toSet
    assert(unchanged.nonEmpty)
    def groupRows(dir: String): Map[Long, Set[String]] = {
      val base = new java.io.File(dir)
      assert(base.isDirectory, s"sink tree missing: $dir")
      spark.read.parquet(dir)
        .select(col("shard_group").cast("long").as("g"),
          concat_ws("|", col("shard_key"), col("n_docs"), col("sum_tokens"),
            col("media_bytes"), col("media_offset"), col("content_xor")).as("row"))
        .as[(Long, String)].collect()
        .groupBy(_._1).map { case (g, rs) => g -> rs.map(_._2).toSet }
    }
    val a = groupRows(SparkEntry.mediaNightlySinkA)
    val b = groupRows(SparkEntry.mediaNightlySinkB)
    unchanged.foreach { g =>
      assert(a.contains(g) && b.contains(g), s"unchanged group $g missing from a sink")
      assert(a(g) === b(g), s"unchanged group $g differs across epochs")
    }
    // a media-revision group differs ONLY through px/witness — the token
    // stream must be identical (the media-only delta class has teeth)
    val g6 = diff.filter(r => r.getAs[String]("change") == "changed" &&
        r.getAs[Long]("shard_group") % 16 == 6 &&
        r.getAs[Long]("shard_group") < 70000000L / 64)
      .map(_.getAs[Long]("shard_group"))
    assert(g6.nonEmpty, "no media-revision group classified as changed")
    g6.foreach { g =>
      assert(a(g) !== b(g), s"media-revised group $g reads identical")
      def tokensOf(m: Map[Long, Set[String]]) =
        m(g).map(_.split('|') match { case arr => (arr(0), arr(2)) })
      assert(tokensOf(a) === tokensOf(b),
        s"media-revised group $g moved its token stream — captions were untouched")
    }
  }
}
