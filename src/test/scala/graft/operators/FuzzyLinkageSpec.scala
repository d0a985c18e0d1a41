package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FuzzyLinkageSpec extends SparkSpec {
  import spark.implicits._

  private def titles = LinkData.titles(table("documents"))

  test("threshold levenshtein matches the unbounded form at or below the bound") {
    val pairs = Seq(
      ("abcdef", "abcdef", 0), ("abcdef", "abcde", 1), ("abcdef", "abcdqz", 2))
      .toDF("a", "b", "want")
    val got = pairs.select(levenshtein(col("a"), col("b"), 2).as("d"), col("want"))
      .collect()
    got.foreach(r => assert(r.getInt(0) === r.getInt(1)))
    // past the bound: the threshold form signals -1, never a wrong distance
    val far = Seq(("abcdef", "zzzzzz")).toDF("a", "b")
      .select(levenshtein(col("a"), col("b"), 2)).head().getInt(0)
    assert(far === -1)
  }

  test("delete-1 and sub-2 twins link; vowel-mangled twins do not") {
    val summary = FuzzyLinkage.linkSummary(
      LinkData.dirtyRecords(titles), col("doc_id"), col("title"),
      titles, col("doc_id"), col("title"), maxDist = 2)
      .withColumn("cls", (col("probe_id") - LinkData.DirtyIdOffset) % 3)
      .collect()
    val byCls = summary.groupBy(_.getAs[Long]("cls"))
    // class 0 (delete last char) and class 1 (sub last 2): every probe links,
    // and its ORIGINAL is among the matches (best_dist within the bound).
    Seq(0L, 1L).foreach { c =>
      val rows = byCls(c)
      assert(rows.nonEmpty)
      assert(rows.forall(_.getAs[Long]("n_matches") >= 1L), s"class $c unlinked probes")
      assert(rows.forall { r =>
        val d = r.getAs[Long]("best_dist"); d >= 0L && d <= 2L
      })
    }
    // class 2 (vowel mangle): no probe links — word-salad titles always
    // carry >2 vowels past the first two tokens.
    assert(byCls(2L).forall(_.getAs[Long]("n_matches") === 0L))
  }

  test("best match is the original document for delete-1 twins") {
    val summary = FuzzyLinkage.linkSummary(
      LinkData.dirtyRecords(titles), col("doc_id"), col("title"),
      titles, col("doc_id"), col("title"), maxDist = 2)
      .filter((col("probe_id") - LinkData.DirtyIdOffset) % 3 === 0)
    // dist to the original is 1; a different doc at dist 0 or a tie at
    // dist 1 with a smaller id can only displace it if the titles are
    // near-identical — assert the original is at least AMONG the matches
    // by checking best_dist ≤ 1 for every class-0 probe.
    assert(summary.filter(col("best_dist") > 1).count() === 0L)
  }

  test("salting leaves the candidate set unchanged") {
    val dirty = LinkData.dirtyRecords(titles)
    val hot = FuzzyLinkage.candidates(dirty, col("doc_id"), col("title"),
      titles, col("doc_id"), col("title"), maxDist = 2, hotBlockThreshold = 2)
    val cold = FuzzyLinkage.candidates(dirty, col("doc_id"), col("title"),
      titles, col("doc_id"), col("title"), maxDist = 2, hotBlockThreshold = 1 << 20)
    assert(hot.count() === cold.count())
    assert(hot.select("probe_id", "index_id")
      .except(cold.select("probe_id", "index_id")).count() === 0L)
  }

  test("probes whose block has no index entry still report a row") {
    val summary = FuzzyLinkage.linkSummary(
      LinkData.dirtyRecords(titles), col("doc_id"), col("title"),
      titles, col("doc_id"), col("title"), maxDist = 2)
    assert(summary.count() === titles.count())
    val empty = summary.filter(col("n_cand") === 0)
    assert(empty.count() > 0L)
    assert(empty.filter(col("best_dist") =!= -1 || col("best_index_id") =!= -1)
      .count() === 0L)
  }
}
