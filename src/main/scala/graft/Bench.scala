package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: pay JIT/codegen/parquet-reader startup once, not
    // inside whichever query happens to run first.
    try SparkEntry.queries("q_geo_pipeline")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink forces full computation of every column (count() would let
    // Catalyst prune projections and drop sorts).
    val timeoutSec = sys.env.getOrElse("SPARK_GRAFT_QUERY_TIMEOUT", "600").toLong
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // see Verify: a timed-out query's thread can keep submitting jobs;
    // re-cancel its group each iteration so it cannot pollute later timings.
    val staleGroups = scala.collection.mutable.ArrayBuffer.empty[String]
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      staleGroups.foreach(spark.sparkContext.cancelJobGroup)
      CachePool.releaseAll()     // drop prior queries' persisted intermediates
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val work = Future {
        // thread-local: set AND clear on the submitting pool thread.
        spark.sparkContext.setJobGroup(s"bench-$name", name, interruptOnCancel = true)
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        finally spark.sparkContext.clearJobGroup()
      }
      try Await.result(work, timeoutSec.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          spark.sparkContext.cancelJobGroup(s"bench-$name")
          staleGroups += s"bench-$name"
          System.err.println(s"[bench] $name timed out after ${timeoutSec}s")
        case e: Throwable => System.err.println(s"[bench] $name: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
