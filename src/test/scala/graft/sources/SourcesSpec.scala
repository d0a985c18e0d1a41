package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

import graft.SparkSpec

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("Jsonl round-trips gzipped shards losslessly under an explicit schema") {
    val dir = Files.createTempDirectory("graft_jsonl_spec").toString
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "escapes: \"quotes\" \\ backslash \n newline \t tab", "en"),
      (3L, "unicode: é中文", "zh")).toDF("doc_id", "text", "lang")
    Jsonl.write(docs, dir)
    // shards really are gzip members
    val shards = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter { p =>
        val name = Paths.get(p).getFileName.toString
        name.startsWith("part-") // data shards only, not .crc sidecars
      }
    assert(shards.nonEmpty && shards.forall(_.endsWith(".json.gz")), shards.toSeq)
    val back = Jsonl.read(spark, dir, docs.schema)
      .as[(Long, String, String)].collect().sortBy(_._1).toSeq
    assert(back === docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
    // corrupt shard surfaces as nulls under PERMISSIVE, throws under FAILFAST
    Files.writeString(Paths.get(dir, "part-junk.json"), "{not json}\n")
    val permissive = Jsonl.read(spark, dir, docs.schema)
    assert(permissive.count() === 4L)
    assert(permissive.filter(col("doc_id").isNull).count() === 1L)
    intercept[org.apache.spark.SparkException] {
      Jsonl.read(spark, dir, docs.schema, mode = "FAILFAST").count()
    }: Unit
  }

  test("OrcInterchange round-trips losslessly and pushes filters to the ORC scan") {
    val dir = Files.createTempDirectory("graft_orc_spec").toString
    val docs = Seq(
      (1L, "plain text", "en"),
      (2L, "unicode: é中文 \n newline", "zh"),
      (3L, "third", "en")).toDF("doc_id", "text", "lang")
    OrcInterchange.write(docs, dir)
    val back = OrcInterchange.read(spark, dir, docs.schema)
    assert(back.as[(Long, String, String)].collect().sortBy(_._1).toSeq ===
      docs.as[(Long, String, String)].collect().sortBy(_._1).toSeq)
    // predicate pushdown reaches the ORC scan like on parquet
    val formatted = back.filter(col("doc_id") > 1L).queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters: [") &&
      formatted.contains("GreaterThan(doc_id"), formatted)
  }

  test("CsvSource reads UTF-16, quoted multi-line, escaped CSV (the reference's input shape)") {
    val csv =
      "house_id,address,square\n" +
        "1,\"Москва, ул. Ленина\nд. 5\",45.5\n" +
        "2,\"Дом с \"\"кавычками\"\"\",60.1\n" +
        "3,Простой адрес,72.0\n"
    val dir = Files.createTempDirectory("graft_csv")
    val f = dir.resolve("houses.csv")
    Files.write(f, csv.getBytes(StandardCharsets.UTF_16))

    val df = CsvSource.read(spark, f.toString)
    val rows = df.orderBy("house_id")
      .select(col("house_id").cast("long"), col("address"), col("square").cast("double"))
      .as[(Long, String, Double)].collect().toSeq
    assert(rows === Seq(
      (1L, "Москва, ул. Ленина\nд. 5", 45.5),
      (2L, "Дом с \"кавычками\"", 60.1),
      (3L, "Простой адрес", 72.0)))
  }

  test("CsvSource with explicit schema skips inference (single scan) and casts") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("house_id", LongType), StructField("address", StringType),
      StructField("square", DoubleType)))
    val dir = Files.createTempDirectory("graft_csv2")
    val f = dir.resolve("h.csv")
    Files.write(f, "house_id,address,square\n7,x,1.5\n".getBytes(StandardCharsets.UTF_16))
    val df = CsvSource.read(spark, f.toString, schema = Some(schema))
    assert(df.schema === schema)
    assert(df.as[(Long, String, Double)].head() === ((7L, "x", 1.5)))
  }

  test("BatchSink.foreachBatched drains partitions in bounded batches, off-driver") {
    val rowsAcc = new LongAccumulator
    val batchesAcc = new LongAccumulator
    val oversizeAcc = new LongAccumulator
    spark.sparkContext.register(rowsAcc, "rows")
    spark.sparkContext.register(batchesAcc, "batches")
    spark.sparkContext.register(oversizeAcc, "oversize")

    val df = spark.range(0, 10007, 1, 8).toDF("id")
    BatchSink.foreachBatched(df, batchSize = 100) { batch =>
      rowsAcc.add(batch.size.toLong)
      batchesAcc.add(1L)
      if (batch.size > 100) oversizeAcc.add(1L)
    }
    assert(rowsAcc.value === 10007L)
    assert(oversizeAcc.value === 0L)
    // 8 partitions × ceil-division batches; at least ceil(10007/100)
    assert(batchesAcc.value >= 101L && batchesAcc.value <= 109L)
  }

  test("writeParquetPartitioned produces one file per partition value (no small-file blowup)") {
    val df = spark.range(0, 1000).toDF("id")
      .withColumn("part", (col("id") % 4).cast("string"))
    val out = Files.createTempDirectory("graft_pw").toString
    BatchSink.writeParquetPartitioned(df, out, Seq("part"))
    val files = Files.list(Paths.get(out)).toArray.map(_.toString)
      .filter(_.contains("part="))
    assert(files.length === 4)
    files.foreach { d =>
      val parquets = Files.list(Paths.get(d)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
      assert(parquets.length === 1, s"$d has ${parquets.length} files")
    }
    assert(spark.read.parquet(out).count() === 1000L)
  }

  test("vacuumSuperseded deletes exactly the unreferenced leaf dirs and empties dead outers") {
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_vacuum_spec").toString
    def mk(rel: String): Unit = {
      val p = Paths.get(dir, rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, "x")
    }
    mk("grp=1/epoch=1/part-0.parquet")   // live
    mk("grp=2/epoch=1/part-0.parquet")   // superseded
    mk("grp=2/epoch=2/part-0.parquet")   // live rewrite
    mk("grp=5/epoch=1/part-0.parquet")   // dead group
    mk("grp=7/epoch=1/part-0.parquet")   // dead group with a stray file
    mk("grp=7/manifest.json")            // ...that must pin the outer dir
    mk("_SUCCESS")                       // non-partition file, untouched
    val deleted = PartitionMaintenance.vacuumSuperseded(
      dir, "grp", "epoch", Set(("1", "1"), ("2", "2")))
    assert(deleted === Seq("grp=2/epoch=1", "grp=5/epoch=1", "grp=7/epoch=1"))
    assert(Files.exists(Paths.get(dir, "grp=1/epoch=1/part-0.parquet")))
    assert(Files.exists(Paths.get(dir, "grp=2/epoch=2/part-0.parquet")))
    assert(!Files.exists(Paths.get(dir, "grp=2/epoch=1")))
    assert(!Files.exists(Paths.get(dir, "grp=5")), "emptied outer dir must drop")
    // ADVICE r15: an outer dir holding ANY non-partition entry is not
    // empty — vacuum must never silently sweep the stray file with it
    assert(Files.exists(Paths.get(dir, "grp=7/manifest.json")),
      "stray non-partition file must survive the outer-dir cleanup")
    assert(Files.exists(Paths.get(dir, "_SUCCESS")))
    // idempotent: second pass deletes nothing
    assert(PartitionMaintenance.vacuumSuperseded(
      dir, "grp", "epoch", Set(("1", "1"), ("2", "2"))) === Seq.empty)
  }

  test("q_vacuum: survivors serve exactly the epoch-2 snapshot; ledger from real deletes") {
    import org.apache.spark.sql.functions._
    val got = graft.SparkEntry.queries("q_vacuum")(spark, Sf)
      .select("grp", "live_epoch", "n_dirs_vacuumed", "rows_after", "sum_tokens_after")
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    val docs = table("documents")
    val base = docs.groupBy(expr("(doc_id div 64) % 16").as("grp"))
      .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    assert(got.map(_._1).toSet === base.keySet, "one row per epoch-1 group")
    got.foreach { case (grp, ep, vac, rows, toks) =>
      if (grp == 5) {
        assert(ep === 0L && rows === 0L && toks === 0L, "dropped group must be gone")
        assert(vac === 1L, "the dead group's dir must really be deleted")
      } else {
        assert(ep === (if (grp == 2) 2L else 1L), s"grp $grp live epoch")
        assert(rows === base(grp), s"grp $grp rows")
        assert(vac === (if (grp == 2) 1L else 0L), s"grp $grp vacuum count")
      }
    }
  }

  test("q_manifest_prune: zone-map skipping is sound and actually skips") {
    import org.apache.spark.sql.functions._
    val docs = table("documents")
    val b = docs.agg(min("n_chars"), max("n_chars")).head()
    val (mn, mx) = (b.getLong(0), b.getLong(1))
    val (lo, hi) = (mn + (mx - mn) / 2, mn + (mx - mn) * 5 / 8)
    val fullBand = docs.filter(col("n_chars").between(lo, hi))
      .agg(count(lit(1)), coalesce(sum("doc_id"), lit(0L))).head()
    val got = graft.SparkEntry.queries("q_manifest_prune")(spark, Sf)
      .select("shard", "n_rows", "zmin", "zmax", "selected", "n_matched",
        "sum_doc_matched")
      .as[(Long, Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    graft.CachePool.releaseAll()
    val selected = got.filter(_._5)
    assert(selected.nonEmpty, "the band must hit at least one shard")
    assert(selected.size < got.size,
      "an eighth-of-domain band over 16 range buckets must skip shards")
    // soundness: the pruned read recovered every matching row + sum
    assert(got.map(_._6).sum === fullBand.getLong(0), "matched rows lost by pruning")
    assert(got.map(_._7).sum === fullBand.getLong(1), "matched sum drifted")
    got.filterNot(_._5).foreach { r =>
      assert(r._6 === 0L, s"unselected shard ${r._1} reported matches")
    }
    // zone maps honest: every selected shard really intersects the band
    selected.foreach { r =>
      assert(r._3 <= hi && r._4 >= lo, s"shard ${r._1} selected without overlap")
    }
  }
}
