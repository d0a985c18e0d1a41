package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a near-duplicate arriving later is flagged against the earlier original") {
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDS().toDF("doc_id", "text")
    val hits = StreamingDedup.nearDupCandidates(docs, threshold = 0.5, ttl = None)
    val q = hits.writeStream.format("memory").queryName("sdedup_out")
      .outputMode("append").start()
    try {
      val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
      input.addData(
        (1L, base),
        (2L, "totally different words entirely unrelated content here " +
          "nothing shared with the original text at all whatsoever"))
      q.processAllAvailable()
      // near-dup of doc 1 arrives in a LATER micro-batch
      input.addData((3L, base + " appended tail tokens"))
      q.processAllAvailable()
      val got = spark.table("sdedup_out")
        .select("doc_id", "matched_id").as[(Long, Long)].collect().toSet
      assert(got.contains((3L, 1L)), s"expected (3,1) in $got")
      assert(!got.exists { case (a, b) => Set(a, b) == Set(1L, 2L) },
        "unrelated docs must not match")
    } finally q.stop()
  }

  test("weighted streaming candidates match the weighted batch pairs (and diverge from set MinHash on boilerplate)") {
    // docB repeats docA 5x: as gram SETS nearly identical (set J ~ 0.78),
    // as gram BAGS far apart (weighted J ~ 0.19) - the discrimination the
    // weighted form exists for. docC appends a short tail to docA (high
    // similarity under BOTH forms). Stream and batch build signatures from
    // the same native expressions, so the weighted stream must emit
    // exactly the weighted batch pair set.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val corpus = Seq(
      (1L, base),
      (2L, Seq.fill(5)(base).mkString(" ")),
      (3L, base + " zz yy xx"),
      (4L, "entirely different content with nothing shared at all " +
        "none of the original tokens appear anywhere in here"))

    def streamPairs(weighted: Boolean, name: String): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, String)](spark)
      val hits = StreamingDedup.nearDupCandidates(
        input.toDS().toDF("doc_id", "text"), threshold = 0.5, ttl = None,
        weighted = weighted)
      val q = hits.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        corpus.foreach { r => input.addData(r); q.processAllAvailable() }
        spark.table(name).select("doc_id", "matched_id").as[(Long, Long)]
          .collect().map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
      } finally q.stop()
    }

    val wStream = streamPairs(weighted = true, "sdedup_w_out")
    val sStream = streamPairs(weighted = false, "sdedup_s_out")
    val wBatch = graft.dedup.MinHashLsh.nearDuplicatesWeighted(
        corpus.toDF("doc_id", "text"), col("doc_id"), col("text"), threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    graft.CachePool.releaseAll()
    assert(wStream === wBatch, s"stream $wStream != batch $wBatch")
    assert(wStream.contains((1L, 3L)) && !wStream.contains((1L, 2L)),
      "weighted form must keep the tail near-dup and reject the 5x repeat")
    assert(sStream.contains((1L, 2L)),
      "set form must (wrongly) merge the boilerplate repeat - the contrast the weighted path fixes")
  }

  test("bucket state caps at maxPerBucket (bounded memory)") {
    val input = MemoryStream[(Long, String)](spark)
    val docs = input.toDS().toDF("doc_id", "text")
    // identical text → identical buckets → all land in the same state list
    val hits = StreamingDedup.nearDupCandidates(docs, threshold = 0.9, maxPerBucket = 3, ttl = None)
    val q = hits.writeStream.format("memory").queryName("sdedup_cap_out")
      .outputMode("append").start()
    try {
      val text = "same exact text for every single document in this stream ok"
      (1L to 6L).foreach(i => input.addData((i, text)))
      q.processAllAvailable()
      val perDoc = spark.table("sdedup_cap_out")
        .groupBy("doc_id").agg(countDistinct("matched_id").as("m"))
        .select("m").as[Long].collect()
      // each new doc compares against at most 3 residents
      assert(perDoc.forall(_ <= 3), perDoc.mkString(","))
      assert(spark.table("sdedup_cap_out").count() > 0)
    } finally q.stop()
  }
}
