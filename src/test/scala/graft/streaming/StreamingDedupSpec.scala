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
