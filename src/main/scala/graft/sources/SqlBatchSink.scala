package graft.sources

import org.apache.spark.sql.DataFrame

/** Concrete SQL sink: the distributed re-expression of the reference's
  * ClickHouse loader (/root/reference/dags/main.py:381-437), which
  * `collect()`s the whole table to the driver and loops over 2000-row
  * INSERT batches there. Here every EXECUTOR PARTITION owns its slice:
  * one connection per partition, one prepared statement, `addBatch` /
  * `executeBatch` every `batchSize` rows, commit per batch — the driver
  * never sees a row, so load throughput scales with partitions and the
  * memory high-water mark is one batch per task.
  *
  * JDBC-generic: works against any driver on the executor classpath
  * (embedded Derby in the test suite; ClickHouse's JDBC driver in the
  * reference's deployment). Only plain strings cross the closure boundary.
  */
object SqlBatchSink {

  /** Append every row of `df` into `table` via batched prepared-statement
    * inserts, one connection per non-empty partition.
    *
    * Failure semantics: commits happen per batch, so a task retry can
    * re-insert its partition's earlier batches — the same at-least-once
    * contract as the reference's loader. For exactly-once, load into a
    * staging table keyed by (partitionId, batch) and MERGE, or make the
    * insert idempotent (primary key + ON CONFLICT) — both are target-DB
    * concerns, deliberately outside this generic client.
    */
  /** Plain-identifier check: table/column names are interpolated into the
    * INSERT text (values never are — they go through the prepared
    * statement), so they must be verifiably inert. Restricting to the
    * unquoted-identifier grammar both blocks SQL injection through a
    * crafted name and sidesteps quoting semantics (quoting flips
    * case-folding rules per dialect, which would silently break matching
    * against unquoted DDL). Names needing quoting are rejected with an
    * explicit error rather than guessed at.
    */
  private val SafeIdent = "[A-Za-z_][A-Za-z0-9_]*".r

  private[sources] def checkIdent(name: String, what: String): Unit =
    require(SafeIdent.matches(name),
      s"$what '$name' is not a plain SQL identifier ([A-Za-z_][A-Za-z0-9_]*); " +
        "rename it or pre-quote it in your own DDL-matched sink")

  /** Open a JDBC connection, honoring `driverClass` when given.
    * DriverManager only sees drivers on the system classpath; a driver
    * shipped via --jars lives in Spark's task classloader, which
    * DriverManager's caller-classloader scan skips. When `driverClass` is
    * given, instantiate it from the context classloader and connect
    * directly — the same workaround Spark's own JDBC source uses. Shared
    * by the executor-side batch inserts AND driver-side admin statements
    * ([[ClickHouseSink.load]]'s count/truncate), so both faces accept the
    * same driver set.
    */
  private[sources] def connect(jdbcUrl: String, props: java.util.Properties,
                               driverClass: Option[String]): java.sql.Connection =
    driverClass match {
      case Some(cls) =>
        val d = Class.forName(cls, true, Thread.currentThread.getContextClassLoader)
          .getDeclaredConstructor().newInstance().asInstanceOf[java.sql.Driver]
        val c = d.connect(jdbcUrl, props)
        if (c == null) throw new java.sql.SQLException(
          s"driver $cls does not accept url $jdbcUrl")
        c
      case None => java.sql.DriverManager.getConnection(jdbcUrl, props)
    }

  def loadTable(df: DataFrame, table: String, jdbcUrl: String,
                batchSize: Int = 2000,
                connectionProps: Map[String, String] = Map.empty,
                driverClass: Option[String] = None): Unit = {
    require(batchSize > 0)
    table.split('.').foreach(checkIdent(_, "table path segment"))
    val cols = df.schema.fieldNames.toSeq
    cols.foreach(checkIdent(_, "column"))
    val insertSql =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")})"
    val props = connectionProps // stable local: the closure captures data, not `this`
    val driver = driverClass
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.hasNext) { // no connection churn for empty partitions
        val p = new java.util.Properties()
        props.foreach { case (k, v) => p.setProperty(k, v) }
        val conn = connect(jdbcUrl, p, driver)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(insertSql)
          try {
            var inBatch = 0
            while (rows.hasNext) {
              val r = rows.next()
              var i = 0
              while (i < cols.length) { ps.setObject(i + 1, r.get(i)); i += 1 }
              ps.addBatch()
              inBatch += 1
              if (inBatch >= batchSize) { ps.executeBatch(); conn.commit(); inBatch = 0 }
            }
            if (inBatch > 0) { ps.executeBatch(); conn.commit() }
          } finally ps.close()
        } finally conn.close()
      }
    }
  }
}
