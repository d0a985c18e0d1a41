package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-trip through a REAL JDBC target (embedded Derby, which ships on
  * Spark's classpath): proves the connection-per-partition lifecycle and
  * batched inserts actually load every row — the distributed equivalent of
  * the reference's driver-side ClickHouse loop.
  */
class SqlBatchSinkSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir"))

  test("loadTable streams every partition through batched inserts into Derby") {
    val db = s"graft_sink_${System.nanoTime()}"
    val url = s"jdbc:derby:$db;create=true"
    val setup = DriverManager.getConnection(url)
    setup.createStatement().execute(
      "CREATE TABLE sink_t (id BIGINT, name VARCHAR(32), score DOUBLE)")
    setup.close()

    // 5003 rows over 7 partitions with batchSize 100: partitions of ~715
    // rows exercise multiple full batches plus a ragged final batch each.
    val df = spark.range(0, 5003)
      .select(col("id"), concat(lit("n"), col("id")).as("name"),
        (col("id") * 0.5).as("score"))
      .repartition(7)
    SqlBatchSink.loadTable(df, "sink_t", url, batchSize = 100)

    val back = DriverManager.getConnection(url)
    val rs = back.createStatement()
      .executeQuery("SELECT count(*), sum(id) FROM sink_t")
    rs.next()
    assert(rs.getLong(1) === 5003L)
    assert(rs.getLong(2) === 5003L * 5002L / 2)
    back.close()
  }
}
