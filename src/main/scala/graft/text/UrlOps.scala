package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL structure analysis — the crawl-curation primitive underneath
  * domain quotas, blocklists and per-site dedup: parse scheme / host /
  * registrable domain / path depth out of a URL column and aggregate at
  * the domain grain.
  *
  * Everything here is native codegen'd string expressions (regexp_extract
  * / substring_index / split) — no UDFs, so the projections inline into
  * whole-stage codegen and run unchanged over a 100 TB crawl frame; the
  * only exchange is the final domain-grain aggregate, which map-side
  * combines to one row per domain per task.
  *
  * The registrable-domain heuristic keeps the last two host labels
  * (`a.b.site.example` → `site.example`) — the public-suffix-list lookup
  * a production crawl adds is a broadcast-map refinement of the same
  * projection, not a different shape.
  */
object UrlOps {

  // RFC 3986 schemes are case-insensitive ("HTTP://" is as valid as
  // "http://"); without (?i) an uppercase-scheme URL would parse to an
  // empty host — collapsing unrelated documents into one canonical ""
  // group and slipping past the blocklist gate.
  private val HostRe = "(?i)^[a-z][a-z0-9+.-]*://([^/?#]+)"
  private val SchemeRe = "(?i)^([a-z][a-z0-9+.-]*)://"
  private val PathRe = "(?i)^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?"

  /** Scheme of `url`, empty string when the value is not URL-shaped. */
  def scheme(url: Column): Column = regexp_extract(url, SchemeRe, 1)

  /** Hostname of `url` (authority without path/query/fragment). */
  def host(url: Column): Column = regexp_extract(url, HostRe, 1)

  /** Last-two-labels registrable domain of a hostname. */
  def registrableDomain(hostCol: Column): Column =
    substring_index(hostCol, ".", -2)

  /** Path component ("" when absent). */
  def path(url: Column): Column = regexp_extract(url, PathRe, 1)

  /** Number of non-empty path segments: "/a/b" → 2, "/" → 0, "" → 0. */
  def pathDepth(url: Column): Column =
    size(filter(split(path(url), "/"), s => length(s) > 0)).cast("long")

  /** Per-row URL structure: (scheme, host, domain, path_depth) appended. */
  def parseUrls(df: DataFrame, url: Column): DataFrame =
    df.withColumn("scheme", scheme(url))
      .withColumn("host", host(url))
      .withColumn("domain", registrableDomain(host(url)))
      .withColumn("path_depth", pathDepth(url))

  /** Domain-grain rollup: per registrable domain, document count,
    * distinct-host count and deepest path — the frame a crawl's quota /
    * blocklist / politeness policies key off. One map-side-combined
    * aggregate; no window, no self-join.
    */
  def domainStats(df: DataFrame, url: Column): DataFrame =
    parseUrls(df, url)
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("host")).as("n_hosts"),
        max(col("path_depth")).as("max_depth"))
      .orderBy("domain")

  /** Dedup-grade URL canonicalization: lowercase host with `www.` and
    * any explicit port stripped, plus the path with trailing slashes
    * stripped — scheme, query and fragment dropped entirely (the
    * variants that alias the same fetched document in practice:
    * http/https, www/bare, tracking query params, trailing slash).
    * Still one codegen'd projection; a production lane refines the rules
    * (per-site query whitelists), not the shape.
    */
  def canonicalUrl(url: Column): Column =
    concat(
      regexp_replace(regexp_replace(lower(host(url)), "^www\\.", ""),
        ":\\d+$", ""),
      regexp_replace(path(url), "/+$", ""))

  /** One row per canonical URL with its variant count — the exact-dedup
    * grouping at the URL grain (canonical-hash shuffle only; document
    * payloads never move).
    */
  def canonicalGroups(df: DataFrame, url: Column): DataFrame =
    df.select(canonicalUrl(url).as("canonical"))
      .groupBy("canonical").agg(count(lit(1)).as("n_variants"))
      .orderBy("canonical")

  /** Drop every row whose registrable domain appears in `blocklist`
    * (a frame with a `domain` column) — the crawl blocklist gate as a
    * LEFT ANTI equi-join. Blocklists are small (thousands of domains
    * against billions of rows), so the join broadcasts and the corpus
    * side never shuffles; plan-audited in PlanAuditSpec.
    */
  def filterBlocked(df: DataFrame, url: Column, blocklist: DataFrame): DataFrame =
    df.withColumn("__bl_domain", registrableDomain(host(url)))
      .join(broadcast(blocklist.select(col("domain").as("__bl_domain")).distinct()),
        Seq("__bl_domain"), "left_anti")
      .drop("__bl_domain")
}
