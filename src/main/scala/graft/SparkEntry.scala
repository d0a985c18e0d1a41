package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analytics.Stats
import graft.etl.{Cleaning, GeoEstatePipeline => Geo}
import graft.sources.BatchSink

/** Driver contract — one `queries` entry per SURVEY.md §2 operator, each with
  * an equivalent DuckDB oracle SQL (hash-checked at sf0.01).
  *
  * Determinism rules (SURVEY.md §4): every query ORDER BYs its output with a
  * unique tie-break; aggregates use exact paths (counts / min / max / integer
  * sums / exact percentile); every computed column is aliased identically in
  * the Spark code and the oracle SQL.
  */
object SparkEntry {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_geo_pipeline")(spark, "/root/testdata/sf0.001")

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ── §2.1 reference surface (GeoEstate-ETL re-expressed) ──────────────
    "q_ingest_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 45)
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")),

    "q_clean_validate" -> ((s, d) =>
      Geo.validated(Geo.dirtyHouses(s, d))
        .select("src_id", "square_s", "year_s", "population_s",
          "latitude_s", "longitude_s", "region", "locality_name", "address")
        .orderBy("src_id")),

    "q_reindex" -> ((s, d) =>
      Cleaning.reindex(
          t(s, d, "orders").filter(col("o_orderstatus") === "F"),
          col("o_orderkey"), "new_id")
        .select("new_id", "o_orderkey", "o_totalprice")
        .orderBy("new_id")),

    "q_typecast" -> ((s, d) =>
      Geo.houses(s, d)
        .select("house_id", "src_id", "latitude", "longitude",
          "maintenance_year", "square", "population")
        .orderBy("house_id")),

    "q_year_stats" -> ((s, d) =>
      Stats.centralStats(Geo.houses(s, d), year(col("maintenance_year")))
        .select(col("avg_v").as("avg_year"), col("median_v").as("median_year"))),

    "q_top_groups" -> ((s, d) =>
      Stats.topGroupsByCount(Geo.houses(s, d), col("region"), 10)),

    "q_top_cities" -> ((s, d) =>
      Stats.topGroupsByCount(Geo.houses(s, d), col("locality_name"), 10)),

    "q_minmax_by_group" -> ((s, d) =>
      Stats.minMaxByGroup(Geo.houses(s, d), col("region"), col("square"))
        .select(col("region"), col("max_v").as("max_square"), col("min_v").as("min_square"))),

    "q_decade_histogram" -> ((s, d) =>
      Stats.bucketHistogram(
          Geo.houses(s, d).select(year(col("maintenance_year")).as("y")),
          col("y"), 10, "decade")),

    "q_batch_sink_roundtrip" -> ((s, d) => {
      val houses = Geo.houses(s, d)
      val out = java.nio.file.Files.createTempDirectory("graft_sink").toString
      BatchSink.writeParquetPartitioned(houses, out, Seq("region"))
      val back = s.read.parquet(out)
      back.groupBy("region")
        .agg(count(lit(1)).as("n_objects"), sum(col("population")).as("sum_pop"))
        .orderBy("region")
    }),

    "q_topk_filter" -> ((s, d) =>
      Stats.topKFilter(Geo.houses(s, d), col("square") > 60, col("square"),
          Seq(col("house_id")), 25)
        .select("house_id", "square", "region", "address")),

    "q_geo_pipeline" -> ((s, d) =>
      Geo.houses(s, d)
        .groupBy("region")
        .agg(
          count(lit(1)).as("n_objects"),
          max(col("square")).as("max_square"),
          min(col("square")).as("min_square"),
          avg(year(col("maintenance_year"))).as("avg_year"))
        .orderBy("region"))
  )

  /** DuckDB CTE reproducing the derived dirty-houses table + the cleaning /
    * validation / cast pipeline (mirrors graft.etl.GeoEstatePipeline).
    */
  private val HousesCte: String =
    """WITH dirty AS (
      |  SELECT c.c_custkey AS src_id,
      |    CASE WHEN c.c_custkey % 11 = 0 THEN ' n/a '
      |         ELSE concat('  ', CAST((c.c_custkey * 37) % 100000 AS VARCHAR), '.',
      |                     lpad(CAST(c.c_custkey % 100 AS VARCHAR), 2, '0'), ' м² ') END AS square_raw,
      |    CASE WHEN c.c_custkey % 13 = 0 THEN ' построен '
      |         ELSE concat(CAST((c.c_custkey % 120) + 1900 AS VARCHAR), ' г.') END AS year_raw,
      |    concat(' ', CAST(c.c_nationkey AS VARCHAR), ' чел.') AS population_raw,
      |    concat(CAST(c.c_custkey % 90 AS VARCHAR), '.', CAST((c.c_custkey * 7919) % 1000000 AS VARCHAR)) AS latitude_raw,
      |    concat(CAST(c.c_custkey % 180 AS VARCHAR), '.', CAST((c.c_custkey * 104729) % 1000000 AS VARCHAR)) AS longitude_raw,
      |    CASE WHEN c.c_custkey % 17 = 0 THEN '' ELSE n.n_name END AS region,
      |    c.c_mktsegment AS locality_name,
      |    concat(c.c_name, ' / ', n.n_name) AS address
      |  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |), cleaned AS (
      |  SELECT src_id,
      |    regexp_replace(trim(square_raw), '[^0-9.]', '', 'g') AS square_s,
      |    regexp_replace(trim(year_raw), '[^0-9]', '', 'g') AS year_s,
      |    regexp_replace(trim(population_raw), '[^0-9]', '', 'g') AS population_s,
      |    regexp_replace(trim(latitude_raw), '[^0-9.\-]', '', 'g') AS latitude_s,
      |    regexp_replace(trim(longitude_raw), '[^0-9.\-]', '', 'g') AS longitude_s,
      |    region, locality_name, address
      |  FROM dirty
      |), valid AS (
      |  SELECT * FROM cleaned
      |  WHERE regexp_matches(square_s, '^[0-9]+(\.[0-9]+)?$') AND TRY_CAST(square_s AS DOUBLE) IS NOT NULL
      |    AND regexp_matches(year_s, '^[0-9]{4}$') AND TRY_CAST(year_s AS INTEGER) IS NOT NULL
      |    AND regexp_matches(population_s, '^[0-9]+$') AND TRY_CAST(population_s AS INTEGER) IS NOT NULL
      |    AND TRY_CAST(latitude_s AS DOUBLE) IS NOT NULL
      |    AND TRY_CAST(longitude_s AS DOUBLE) IS NOT NULL
      |    AND region IS NOT NULL AND trim(region) <> ''
      |    AND locality_name IS NOT NULL AND trim(locality_name) <> ''
      |    AND address IS NOT NULL AND trim(address) <> ''
      |), houses AS (
      |  SELECT row_number() OVER (ORDER BY src_id) AS house_id, src_id,
      |    round(CAST(latitude_s AS DOUBLE), 6) AS latitude,
      |    round(CAST(longitude_s AS DOUBLE), 6) AS longitude,
      |    make_date(CAST(year_s AS INTEGER), 1, 1) AS maintenance_year,
      |    CAST(square_s AS DOUBLE) AS square,
      |    CAST(population_s AS INTEGER) AS population,
      |    region, locality_name, address
      |  FROM valid
      |)
      |""".stripMargin

  /** For each key in `queries`, equivalent ANSI SQL runnable by DuckDB on the
    * same parquet tables. Omitted keys get a rows-only check.
    */
  def oracleSql: Map[String, String] = Map(
    "q_ingest_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE l_quantity > 45 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_clean_validate" -> (HousesCte +
      """SELECT src_id, square_s, year_s, population_s, latitude_s, longitude_s,
        |  region, locality_name, address
        |FROM valid ORDER BY src_id""".stripMargin),

    "q_reindex" ->
      """SELECT row_number() OVER (ORDER BY o_orderkey) AS new_id, o_orderkey, o_totalprice
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY new_id""".stripMargin,

    "q_typecast" -> (HousesCte +
      """SELECT house_id, src_id, latitude, longitude, maintenance_year, square, population
        |FROM houses ORDER BY house_id""".stripMargin),

    "q_year_stats" -> (HousesCte +
      """SELECT avg(year(maintenance_year)) AS avg_year,
        |  quantile_cont(year(maintenance_year), 0.5) AS median_year
        |FROM houses""".stripMargin),

    "q_top_groups" -> (HousesCte +
      """SELECT region, count(*) AS n_objects FROM houses
        |GROUP BY region ORDER BY n_objects DESC, region LIMIT 10""".stripMargin),

    "q_top_cities" -> (HousesCte +
      """SELECT locality_name, count(*) AS n_objects FROM houses
        |GROUP BY locality_name ORDER BY n_objects DESC, locality_name LIMIT 10""".stripMargin),

    "q_minmax_by_group" -> (HousesCte +
      """SELECT region, max(square) AS max_square, min(square) AS min_square
        |FROM houses GROUP BY region ORDER BY region""".stripMargin),

    "q_decade_histogram" -> (HousesCte +
      """SELECT CAST(floor(year(maintenance_year) / 10) * 10 AS BIGINT) AS decade,
        |  count(*) AS n
        |FROM houses GROUP BY decade ORDER BY decade""".stripMargin),

    "q_batch_sink_roundtrip" -> (HousesCte +
      """SELECT region, count(*) AS n_objects, CAST(sum(population) AS BIGINT) AS sum_pop
        |FROM houses GROUP BY region ORDER BY region""".stripMargin),

    "q_topk_filter" -> (HousesCte +
      """SELECT house_id, square, region, address FROM houses
        |WHERE square > 60 ORDER BY square DESC, house_id LIMIT 25""".stripMargin),

    "q_geo_pipeline" -> (HousesCte +
      """SELECT region, count(*) AS n_objects, max(square) AS max_square,
        |  min(square) AS min_square, avg(year(maintenance_year)) AS avg_year
        |FROM houses GROUP BY region ORDER BY region""".stripMargin)
  )
}
