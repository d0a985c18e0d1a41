package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-file compaction: the standing maintenance task of any parquet
  * lake. Streaming sinks and fine-grained partitioned writes accumulate
  * files far below the ideal scan unit; a 100 TB table fragmented into
  * 4 MB files pays ~30k× the driver listing cost and loses vectorized-read
  * efficiency.
  *
  * Strategy: size the output file count from the actual byte size
  * (`targetBytes` per file, e.g. 128-512 MB), rewrite with a plain
  * `repartition(n)` (round-robin — balanced without a shuffle key), then
  * atomically swap directories. On object stores the swap is a manifest
  * commit; the local-FS variant here uses two renames.
  */
object Compaction {

  /** Bytes under `dir` (recursive, data files only). */
  def dataBytes(dir: String): Long = {
    val root = Paths.get(dir)
    if (!Files.exists(root)) 0L
    else Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("_"))
      .map(Files.size).sum
  }

  /** Number of parquet part-files under `dir`. */
  def dataFiles(dir: String): Int = {
    val root = Paths.get(dir)
    Files.walk(root).iterator().asScala
      .count(p => p.getFileName.toString.endsWith(".parquet"))
  }

  /** Rewrite `dir` into ~`targetBytes`-sized files. Returns the new file
    * count. Compression makes on-disk size ≈ input size, so the input
    * byte count is the sizing signal.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long = 128L * 1024 * 1024): Int = {
    val bytes = dataBytes(dir)
    val n = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val tmp = dir + ".compact_tmp"
    spark.read.parquet(dir).repartition(n).write.mode("overwrite").parquet(tmp)
    val old = Paths.get(dir + ".compact_old")
    Files.move(Paths.get(dir), old)
    Files.move(Paths.get(tmp), Paths.get(dir))
    def rm(p: Path): Unit = {
      if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(rm)
      Files.delete(p)
    }
    rm(old)
    n
  }
}
