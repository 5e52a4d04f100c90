package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}

/** MySQL DML sink helpers (SURVEY.md §2.2 K5; reference
  * utils/MySQLWrapper.py:78-106). Inserts ride the built-in JDBC writer;
  * upsert/replace need per-row statements, so the statement text is
  * synthesized here (unit-testable offline) and executed via
  * foreachPartition in `upsert`.
  */
object JdbcSink {

  /** Plain insert: the built-in writer, batched per partition. */
  def insert(df: DataFrame, url: String, table: String,
             props: Map[String, String] = Map.empty): Unit = {
    val p = new java.util.Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    df.write.mode(SaveMode.Append).jdbc(url, table, p)
  }

  /** `INSERT … ON DUPLICATE KEY UPDATE` statement for one row shape —
    * MySQL's upsert (REPLACE-from-dict parity).
    */
  def upsertSql(table: String, columns: Seq[String]): String = {
    val collist = columns.mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    val updates = columns.map(c => s"$c = VALUES($c)").mkString(", ")
    s"INSERT INTO $table ($collist) VALUES ($placeholders) ON DUPLICATE KEY UPDATE $updates"
  }

  /** Distributed upsert: one connection + prepared statement per
    * partition, batched execution. Partition count bounds source-DB
    * connection pressure — `df.repartition(n)` first to control it.
    */
  def upsert(df: DataFrame, url: String, table: String, batchSize: Int = 500): Unit = {
    val columns = df.columns.toSeq
    val sql = upsertSql(table, columns)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        // transient connect failures are the common DB-side flake; retry
        // with backoff (reference: MySQLWrapper.py:34-41) before letting
        // the task fail into Spark's own retry layer
        val conn = graft.util.Retry.withBackoff(attempts = 3, baseDelayMs = 1000L) {
          java.sql.DriverManager.getConnection(url)
        }
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { r =>
            columns.indices.foreach(i => st.setObject(i + 1, r.get(i)))
            st.addBatch(); n += 1
            if (n % batchSize == 0) st.executeBatch()
          }
          st.executeBatch()
          conn.commit()
        } finally conn.close()
      }
    }
  }
}
