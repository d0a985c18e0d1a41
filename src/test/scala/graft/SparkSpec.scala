package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for all suites (Spark startup is ~5s). */
object SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(cores = 4)
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  val Sf: String = "/root/testdata/sf0.001"

  def table(name: String): org.apache.spark.sql.DataFrame =
    GraftSession.table(spark, Sf, name)
}
