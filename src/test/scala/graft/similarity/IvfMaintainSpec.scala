package graft.similarity

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The repack mechanics behind q_ivf_maintain: posting lists live as a
  * cell-partitioned parquet tree, and maintenance rewrites ONLY the cell
  * dirs holding delta members (dynamic partition overwrite). At production
  * nlist the delta touches a sliver of the tree, so the untouched-dir
  * guarantee is what makes nightly maintenance affordable at 100 TB — pin
  * it on a synthetic frame where one cell genuinely has no delta (the real
  * embeddings table spans every cell with both delta groups, so the query
  * itself can't witness an untouched list at test scale).
  */
class IvfMaintainSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(dir: String): Map[String, Seq[(String, Long)]] = {
    val root = Paths.get(dir)
    val stream = Files.walk(root)
    try {
      stream.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .toSeq
        .groupBy(p => root.relativize(p).getName(0).toString)
        .map { case (cell, ps) =>
          cell -> ps.map(p => (p.getFileName.toString, Files.size(p))).sorted
        }
    } finally stream.close()
  }

  private def digest(p: Path): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(Files.readAllBytes(p)).map("%02x".format(_)).mkString
  }

  test("dynamic-overwrite repack rewrites only affected cell dirs; tombstones and revisions land") {
    val dir = Files.createTempDirectory("graft_ivf_repack").toString + "/postings"
    // three posting lists; cell 2 will carry NO delta
    val pre = Seq(
      (0L, 1L, 0L), (1L, 1L, 0L), (100L, 1L, 0L), // cell 0: 100 is a dup to tombstone
      (2L, 1L, 1L), (3L, 1L, 1L),                 // cell 1: 3 gets revised
      (4L, 1L, 2L), (5L, 1L, 2L))                 // cell 2: untouched
      .toDF("vec_id", "ver", "cell")
    pre.coalesce(1).write.partitionBy("cell").parquet(dir)
    val before = partFiles(dir)
    val untouchedHashes = {
      val root = Paths.get(dir)
      val stream = Files.walk(root.resolve("cell=2"))
      try stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> digest(p)).toMap
      finally stream.close()
    }

    // repack cells 0 and 1: drop the dup, bump 3 to ver 2, append 6
    val repl = Seq(
      (0L, 1L, 0L), (1L, 1L, 0L),
      (2L, 1L, 1L), (3L, 2L, 1L), (6L, 1L, 1L))
      .toDF("vec_id", "ver", "cell")
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "STATIC")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      repl.coalesce(1).write.mode("overwrite").partitionBy("cell").parquet(dir)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    val after = partFiles(dir)
    // cell 2's files are byte-identical — same names, same content
    assert(after("cell=2") === before("cell=2"))
    val afterHashes = {
      val root = Paths.get(dir)
      val stream = Files.walk(root.resolve("cell=2"))
      try stream.iterator().asScala
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .map(p => p.getFileName.toString -> digest(p)).toMap
      finally stream.close()
    }
    assert(afterHashes === untouchedHashes, "untouched posting list was rewritten")
    // affected cells were rewritten (fresh file names)
    assert(after("cell=0").map(_._1).intersect(before("cell=0").map(_._1)).isEmpty)
    assert(after("cell=1").map(_._1).intersect(before("cell=1").map(_._1)).isEmpty)

    val back = spark.read.parquet(dir)
      .select("vec_id", "ver", "cell").as[(Long, Long, Long)].collect().toSet
    assert(!back.exists(_._1 == 100L), "tombstoned id survived the repack")
    assert(back.contains((3L, 2L, 1L)), "revision did not land")
    assert(back.contains((6L, 1L, 1L)), "append did not land")
    assert(back.contains((4L, 1L, 2L)) && back.contains((5L, 1L, 2L)))
  }

  test("dropDeadPartitions reconciles an emptied posting list; live lists untouched") {
    // dynamic overwrite cannot delete a partition absent from the
    // replacement frame — the reconcile step must, and ONLY that one
    val dir = Files.createTempDirectory("graft_ivf_dead").toString + "/postings"
    Seq((0L, 1L, 0L), (1L, 1L, 1L), (2L, 1L, 2L))
      .toDF("vec_id", "ver", "cell")
      .coalesce(1).write.partitionBy("cell").parquet(dir)
    // cell 1's rows all died: live set = {0, 2}
    val dropped = graft.sources.PartitionMaintenance.dropDeadPartitions(
      dir, "cell", Set("0", "2"))
    assert(dropped === Seq("1"))
    assert(!Files.exists(Paths.get(dir, "cell=1")), "dead list still on disk")
    val back = spark.read.parquet(dir)
      .select("vec_id", "cell").as[(Long, Long)].collect().toSet
    assert(back === Set((0L, 0L), (2L, 2L)))
    // idempotent and prefix-safe: nothing else to drop, unrelated names kept
    Files.createDirectory(Paths.get(dir, "not_a_partition"))
    assert(graft.sources.PartitionMaintenance.dropDeadPartitions(
      dir, "cell", Set("0", "2")) === Seq.empty)
    assert(Files.exists(Paths.get(dir, "not_a_partition")))
  }

  test("q_ivf_maintain invariants on the real table: occupancy restored, recall exact") {
    val got = graft.SparkEntry.queries("q_ivf_maintain")(spark, Sf)
      .select("cell", "n_before", "n_after", "n_tomb", "n_appended",
        "n_rev_moved", "imb_before", "imb_after", "n_queries", "recovered")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.size === 8)
    got.foreach { case (cell, nb, na, nt, napp, mvd, imbB, imbA, nq, rec) =>
      // n_after = n_before − tombstones + appends, per cell
      assert(na === nb - nt + napp, s"cell $cell ledger broken")
      assert(mvd === 0L, s"cell $cell: a dyadic revision moved cells")
      assert(imbB >= 2400L, "tripled hot cell must trip the gauge by arithmetic")
      assert(imbA < 2000L, "maintenance must restore the gauge")
      assert(rec === nq, "every dropped original must recover its re-key")
    }
  }

  test("q_ivf_merge: disjoint shard postings compose — counts add, XORs cancel, nothing lost") {
    val total = table("embeddings").count()
    val got = graft.SparkEntry.queries("q_ivf_merge")(spark, Sf)
      .select("cell", "n_a", "n_b", "n_merged", "xor_a", "xor_b",
        "xor_merged", "merge_sound")
      .as[(Long, Long, Long, Long, Long, Long, Long, Boolean)].collect().toSeq
    graft.CachePool.releaseAll()
    assert(got.size === 8, "one-hot codebook spans all 8 cells at every sf")
    got.foreach { case (cell, na, nb, nm, xa, xb, xm, sound) =>
      assert(sound, s"cell $cell merge unsound")
      assert(na + nb === nm, s"cell $cell counts")
      assert((xa ^ xb) === xm, s"cell $cell XOR composition")
    }
    assert(got.map(_._4).sum === total, "merged postings must cover the corpus")
    // the composition is a real certificate: losing ONE posting from a
    // half breaks it (xor of a nonzero witness never cancels silently)
    val w = (id: Long) => (id & 0x7FFFFFFFL) * 2654435761L
    val ids = Seq(3L, 17L, 41L)
    val full = ids.map(w).reduce(_ ^ _)
    val dropped = ids.tail.map(w).reduce(_ ^ _)
    assert(full !== dropped)
  }
}
