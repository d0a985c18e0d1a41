package graft

import org.apache.spark.sql.functions._

/** The unpersist contract: operators register their internal persists;
  * one releaseAll() after the consuming action leaves nothing cached —
  * a long-lived session looping over operators must not accumulate frames.
  */
class CachePoolSpec extends SparkSpec {

  test("releaseAll drops every operator-internal persist") {
    CachePool.releaseAll() // start from a clean registry
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val docs = dedup.DedupData.withPlantedDups(table("documents"))
    // three operators that each persist internally
    dedup.MinHashLsh.nearDuplicates(docs, col("doc_id"), col("text"))
      .write.format("noop").mode("overwrite").save()
    dedup.NGramJaccard.containmentPairs(docs, col("doc_id"), col("text"), col("source"))
      .write.format("noop").mode("overwrite").save()
    text.Fingerprint.sharedRunPairs(docs, col("doc_id"), col("text"))
      .write.format("noop").mode("overwrite").save()
    assert(CachePool.registered >= 3)
    val during = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(during.nonEmpty, "operators should have persisted internal frames")
    CachePool.releaseAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(after.isEmpty, s"persists leaked past releaseAll: $after")
    assert(CachePool.registered === 0)
  }
}
