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

  test("releaseGroup drops only the named group's frames") {
    CachePool.releaseAll()
    // registrations are keyed by the registering THREAD's job group — the
    // Verify/Bench harness isolation contract: releasing one query's
    // frames must not degrade a concurrently running query's persists.
    spark.sparkContext.setJobGroup("cp-g1", "g1")
    val f1 = CachePool.persist(table("documents").select("doc_id"))
    f1.count()
    spark.sparkContext.setJobGroup("cp-g2", "g2")
    val f2 = CachePool.persist(table("documents").select("doc_id", "lang"))
    f2.count()
    spark.sparkContext.clearJobGroup()
    assert(CachePool.registered === 2)
    CachePool.releaseGroup("cp-g1")
    assert(CachePool.registered === 1)
    assert(f1.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
    assert(f2.storageLevel.useMemory, "the other group's frame must stay persisted")
    CachePool.releaseAll()
    assert(CachePool.registered === 0)
    assert(f2.storageLevel === org.apache.spark.storage.StorageLevel.NONE)
  }
}
