package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode}

/** MySQL DML sink helpers (SURVEY.md §2.2 K5; reference
  * utils/MySQLWrapper.py:78-106). Inserts ride the built-in JDBC writer;
  * upsert/replace need per-row statements, so the statement text is
  * synthesized here (unit-testable offline) and executed via
  * foreachPartition in `upsert`.
  */
object JdbcSink {

  /** Embedded Derby is an in-JVM engine whose MERGE is not safe under
    * concurrent same-statement execution: two executor threads racing
    * the same MERGE text can hit an internal NPE
    * (MatchingClauseConstantAction._actionRS null) and — worse — leave
    * the database-level statement-plan cache in a state where later
    * MERGEs silently skip their action (observed once in the gate as a
    * lost INSERT that a clean rerun replayed fine). Server-mode
    * databases are unaffected; for `jdbc:derby:` URLs the partition
    * transactions serialize on this JVM-wide lock — the distributed
    * plan shape is unchanged, only the embedded test double is
    * protected.
    */
  private val embeddedDerbyMergeLock = new Object

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

  /** ANSI `MERGE INTO … USING SYSIBM.SYSDUMMY1` upsert for engines
    * without MySQL's ON DUPLICATE KEY (Derby, DB2 share the dummy-table
    * idiom; swap the table name for `dual`/`(VALUES(1))` elsewhere).
    * One statement per row shape; parameters bind keys (ON), then
    * non-key updates (SET), then every column (INSERT) — see
    * [[mergeBindOrder]].
    */
  def mergeUpsertSql(table: String, columns: Seq[String], keys: Seq[String]): String = {
    require(keys.nonEmpty && keys.forall(columns.contains),
      s"merge keys $keys must be a nonempty subset of $columns")
    val nonKeys = columns.filterNot(keys.contains)
    val on = keys.map(k => s"$table.$k = ?").mkString(" AND ")
    val collist = columns.mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    val matched =
      if (nonKeys.isEmpty) "" // pure-key rows: nothing to update on match
      else s"WHEN MATCHED THEN UPDATE SET ${nonKeys.map(c => s"$c = ?").mkString(", ")} "
    s"MERGE INTO $table USING SYSIBM.SYSDUMMY1 ON $on " + matched +
      s"WHEN NOT MATCHED THEN INSERT ($collist) VALUES ($placeholders)"
  }

  /** Parameter slot → dataframe column index for [[mergeUpsertSql]]. */
  def mergeBindOrder(columns: Seq[String], keys: Seq[String]): Seq[Int] = {
    val nonKeys = columns.filterNot(keys.contains)
    (keys ++ nonKeys ++ columns).map(columns.indexOf)
  }

  /** Distributed upsert: one connection + prepared statement per
    * partition, batched execution. Partition count bounds source-DB
    * connection pressure — `df.repartition(n)` first to control it.
    *
    * With `mergeKeys` empty (default) the statement is MySQL's
    * `ON DUPLICATE KEY UPDATE` (the reference's dialect, key owned by
    * the DB schema); with keys given, the ANSI MERGE form runs instead
    * — the variant the live Derby spec and gate query execute.
    */
  def upsert(df: DataFrame, url: String, table: String, batchSize: Int = 500,
             mergeKeys: Seq[String] = Nil): Unit = {
    val columns = df.columns.toSeq
    val sql =
      if (mergeKeys.isEmpty) upsertSql(table, columns)
      else mergeUpsertSql(table, columns, mergeKeys)
    val bind =
      if (mergeKeys.isEmpty) columns.indices.toSeq
      else mergeBindOrder(columns, mergeKeys)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      // materialize the partition so the WHOLE transaction can retry —
      // upserts are idempotent (same final state), so a lock-timeout or
      // deadlock victim (Derby escalates row locks under concurrent
      // MERGEs; MySQL can deadlock on gap locks) re-runs safely. DML
      // partitions are batch-sized by the caller (repartition first),
      // so the buffer is bounded.
      val buf = rows.toVector
      if (buf.nonEmpty) {
        def runTx(): Unit =
          // transient connect failures and lock conflicts are the common
          // DB-side flakes; retry with backoff (reference:
          // MySQLWrapper.py:34-41) before letting the task fail into
          // Spark's own retry layer
          graft.util.Retry.withBackoff(attempts = 3, baseDelayMs = 1000L) {
            val conn = java.sql.DriverManager.getConnection(url)
            try {
              conn.setAutoCommit(false)
              val st = conn.prepareStatement(sql)
              var n = 0
              buf.foreach { r =>
                bind.zipWithIndex.foreach { case (ci, slot) =>
                  st.setObject(slot + 1, r.get(ci))
                }
                st.addBatch(); n += 1
                if (n % batchSize == 0) st.executeBatch()
              }
              st.executeBatch()
              conn.commit()
            } catch {
              case e: Throwable =>
                // roll back BEFORE close: closing with an open transaction
                // throws its own exception and masks the root cause (and
                // some drivers refuse the close outright)
                try conn.rollback() catch { case _: Throwable => () }
                throw e
            } finally conn.close()
          }
        if (url.startsWith("jdbc:derby:"))
          embeddedDerbyMergeLock.synchronized(runTx())
        else runTx()
        ()
      }
    }
  }

  /** EXACTLY-ONCE landing of one bounded micro-batch into a JDBC target
    * (the streaming-foreachBatch → RDBMS pattern): a guard row keyed
    * (APP_ID, BATCH_ID) and the data MERGE commit in ONE transaction, so
    * a crash leaves either nothing or everything, and a replayed batch
    * (restart from an old checkpoint, speculative retry) hits the guard
    * table's primary key and skips WHOLE. Returns true iff this call
    * landed the batch.
    *
    * Driver-side by design: foreachBatch output here is an AGGREGATED
    * micro-batch (windowed counts, watermarked sessions — bounded by the
    * key domain, not the stream). For bulk rows use the distributed
    * [[upsert]] into a staging table + an atomic swap instead — a
    * multi-connection write can't share one transaction.
    */
  def upsertBatchOnce(rows: Seq[org.apache.spark.sql.Row], columns: Seq[String],
                      url: String, table: String, keys: Seq[String],
                      guardTable: String, appId: String,
                      batchId: Long): Boolean = {
    def runTx(): Boolean = {
      val conn = java.sql.DriverManager.getConnection(url)
      try {
        conn.setAutoCommit(false)
        val g = conn.prepareStatement(
          s"INSERT INTO $guardTable (APP_ID, BATCH_ID) VALUES (?, ?)")
        try {
          g.setString(1, appId); g.setLong(2, batchId); g.executeUpdate()
        } catch {
          case _: java.sql.SQLIntegrityConstraintViolationException =>
            conn.rollback(); return false // already landed: skip whole
        } finally g.close()
        val sql = mergeUpsertSql(table, columns, keys)
        val order = mergeBindOrder(columns, keys)
        val ps = conn.prepareStatement(sql)
        try {
          rows.foreach { r =>
            order.zipWithIndex.foreach { case (ci, slot) =>
              ps.setObject(slot + 1, r.get(ci))
            }
            ps.addBatch()
          }
          ps.executeBatch()
        } finally ps.close()
        conn.commit()
        true
      } catch {
        case e: Throwable =>
          try conn.rollback() catch { case _: Throwable => () }
          throw e
      } finally conn.close()
    }
    if (url.startsWith("jdbc:derby:"))
      embeddedDerbyMergeLock.synchronized(runTx())
    else runTx()
  }
}
