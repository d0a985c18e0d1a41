package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("parseUrls extracts scheme/host/domain/path_depth; junk degrades to empty") {
    val df = Seq(
      (1L, "https://a.b.site.example/x/y?q=1#frag"),
      (2L, "http://example.org"),
      (3L, "https://example.org/"),
      (4L, "ftp://h.example.net/a//b/"),
      (5L, "not a url at all")).toDF("id", "url")
    val got = UrlOps.parseUrls(df, col("url"))
      .select("id", "scheme", "host", "domain", "path_depth")
      .as[(Long, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, "https", "a.b.site.example", "site.example", 2L),
      (2L, "http", "example.org", "example.org", 0L),
      (3L, "https", "example.org", "example.org", 0L),
      (4L, "ftp", "h.example.net", "example.net", 2L), // empty segment dropped
      (5L, "", "", "", 0L)))
  }

  test("domainStats rolls up per registrable domain with distinct hosts and max depth") {
    val df = Seq(
      (1L, "https://x.site.example/a"),
      (2L, "https://y.site.example/a/b"),
      (3L, "https://site.example/"),
      (4L, "https://other.example/deep/er/est")).toDF("id", "url")
    val got = UrlOps.domainStats(df, col("url"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("other.example", 1L, 1L, 3L),
      ("site.example", 3L, 3L, 2L)))
  }

  test("query parameters and fragments never leak into host or path") {
    val got = UrlOps.parseUrls(
        Seq((1L, "https://h.example/p?next=https://evil.example/x")).toDF("id", "url"),
        col("url"))
      .select("host", "path_depth").as[(String, Long)].head()
    assert(got === (("h.example", 1L)))
  }

  test("canonicalUrl folds scheme, case, www, port, query and trailing slash") {
    val aliases = Seq(
      "https://www.site.example/p/3/",
      "http://site.example/p/3",
      "https://site.example:443/p/3?utm=x",
      "https://WWW.SITE.EXAMPLE/p/3#frag")
    val got = aliases.zipWithIndex.map { case (u, i) => (i.toLong, u) }
      .toDF("id", "url")
      .select(UrlOps.canonicalUrl(col("url")).as("c")).as[String]
      .collect().toSet
    assert(got === Set("site.example/p/3"))
    // distinct logical URLs stay distinct
    val other = Seq((1L, "https://site.example/p/4"), (2L, "https://other.example/p/3"))
      .toDF("id", "url")
      .select(UrlOps.canonicalUrl(col("url")).as("c")).as[String].collect().toSet
    assert(other === Set("site.example/p/4", "other.example/p/3"))
  }

  test("filterBlocked drops exactly the blocklisted domains via anti-join") {
    val docs = Seq(
      (1L, "https://a.bad.example/x"),
      (2L, "https://good.example/y"),
      (3L, "https://bad.example/z"),
      (4L, "https://also.good.example/w")).toDF("id", "url")
    val bl = Seq("bad.example").toDF("domain")
    val kept = UrlOps.filterBlocked(docs, col("url"), bl)
      .select("id").as[Long].collect().toSet
    assert(kept === Set(2L, 4L))
    // helper column does not leak
    assert(UrlOps.filterBlocked(docs, col("url"), bl).columns.toSeq === Seq("id", "url"))
  }
}
