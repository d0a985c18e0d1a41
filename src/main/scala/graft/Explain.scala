package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Dumps `explain("formatted")` for every SparkEntry query to EXPLAIN.md —
  * the plan-shape evidence (PushedFilters, ReadSchema pruning, broadcast
  * vs shuffle joins, TakeOrderedAndProject, WholeStageCodegen spans)
  * behind the scale claims in SURVEY.md §5.
  *
  * Usage: `sbt "runMain graft.Explain [sfDir] [outFile]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outFile = args.lift(1).getOrElse("EXPLAIN.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder
    sb.append(s"# Physical plans (formatted explain, $sfDir)\n\n")
    sb.append("Regenerate: `sbt \"runMain graft.Explain\"`.\n")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      sb.append(s"\n## $name\n\n```\n")
      try {
        val plan = fn(spark, sfDir).queryExecution
          .explainString(ExplainMode.fromString("formatted"))
        sb.append(plan.linesIterator.take(120).mkString("\n"))
      } catch {
        case e: Throwable => sb.append(s"explain failed: ${e.getMessage}")
      }
      sb.append("\n```\n")
    }
    Files.writeString(Paths.get(outFile), sb.toString)
    println(s"[explain] wrote $outFile")
    spark.stop()
  }
}
