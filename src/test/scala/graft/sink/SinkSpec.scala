package graft.sink

import graft.SparkSpec

class SinkSpec extends SparkSpec {
  import spark.implicits._

  test("Rollback diff-deletes only the files a write added") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rb").toString + "/t"
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir)
    val before = Rollback.listFiles(spark, dir)
    assert(before.nonEmpty)
    Seq((2L, "b")).toDF("id", "v").write.mode("append").parquet(dir)
    assert(spark.read.parquet(dir).count() == 2)
    val deleted = Rollback.deleteAdded(spark, dir, before)
    assert(deleted.nonEmpty)
    assert(spark.read.parquet(dir).as[(Long, String)].collect().toSeq == Seq((1L, "a")))
  }

  test("Rollback on a missing dir is a no-op") {
    assert(Rollback.listFiles(spark, "/tmp/graft-definitely-missing").isEmpty)
    assert(Rollback.deleteAdded(spark, "/tmp/graft-definitely-missing", Set.empty).isEmpty)
  }

  test("upsertSql golden text") {
    assert(JdbcSink.upsertSql("db.t", Seq("id", "v")) ==
      "INSERT INTO db.t (id, v) VALUES (?, ?) ON DUPLICATE KEY UPDATE id = VALUES(id), v = VALUES(v)")
  }

  test("mergeUpsertSql golden text + bind order") {
    assert(JdbcSink.mergeUpsertSql("APP.T", Seq("id", "v", "w"), Seq("id")) ==
      "MERGE INTO APP.T USING SYSIBM.SYSDUMMY1 ON APP.T.id = ? " +
        "WHEN MATCHED THEN UPDATE SET v = ?, w = ? " +
        "WHEN NOT MATCHED THEN INSERT (id, v, w) VALUES (?, ?, ?)")
    assert(JdbcSink.mergeBindOrder(Seq("id", "v", "w"), Seq("id")) ==
      Seq(0, 1, 2, 0, 1, 2))
    intercept[IllegalArgumentException] {
      JdbcSink.mergeUpsertSql("t", Seq("id"), Seq("missing"))
    }
  }

  test("live merge upsert on Derby: insert, update, idempotent replay") {
    System.setProperty("derby.stream.error.file", "/tmp/derby.log")
    val url = "jdbc:derby:memory:graftsink;create=true"
    Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE APP.UP_T") catch { case _: Throwable => () }
      st.execute("CREATE TABLE APP.UP_T (ID BIGINT PRIMARY KEY, V BIGINT)")
    } finally conn.close()
    val b1 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("ID", "V")
    JdbcSink.upsert(b1.repartition(2), url, "APP.UP_T", mergeKeys = Seq("ID"))
    // overlap: 2,3 update; 4 inserts
    val b2 = Seq((2L, 200L), (3L, 300L), (4L, 400L)).toDF("ID", "V")
    JdbcSink.upsert(b2.repartition(2), url, "APP.UP_T", mergeKeys = Seq("ID"))
    // replaying an identical batch must be a no-op on the final state
    JdbcSink.upsert(b2, url, "APP.UP_T", mergeKeys = Seq("ID"))
    val p = new java.util.Properties()
    p.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    val got = spark.read.jdbc(url, "APP.UP_T", p)
      .as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 10L), (2L, 200L), (3L, 300L), (4L, 400L)))
  }

  test("pre-existing window rows are absorbed by append accounting (no rollback loop)") {
    import org.apache.spark.sql.functions._
    import graft.model._
    val dir = java.nio.file.Files.createTempDirectory("graft-absorb").toString
    val store = new graft.state.LogStore(spark, s"$dir/logs")
    val run = new graft.driver.IngestionRun(spark, s"$dir/lake", store)
    val spec = IngestionSpec(9L, "table", "local", "db", "t", "mtime", "", 0, 1,
      "fs", "", "id", "lv", "t_lv", 0, Nil, "g")
    val src = Seq((1L, "2023-01-01 10:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
    assert(run.run(spec, src).last.executionStatus == RunStatus.Success)
    // a row lands in the lake between runs INSIDE the next window (e.g. a
    // backfill job): validation verifies THIS run's load, pre rows count
    // toward the expectation instead of looping a rollback forever
    Seq((99L, "2023-01-15 00:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
      .write.mode("append").parquet(s"$dir/lake/db/t")
    val src2 = Seq((1L, "2023-01-01 10:00:00"), (2L, "2023-02-01 10:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
    val logs2 = run.run(spec, src2)
    assert(logs2.last.executionStatus == RunStatus.Success)
    assert(spark.read.parquet(s"$dir/lake/db/t").count() == 3)
  }

  test("a source that changes mid-run (non-repeatable read) fails validation and rolls back") {
    import org.apache.spark.sql.functions._
    import graft.model._
    val dir = java.nio.file.Files.createTempDirectory("graft-rbrun").toString
    val store = new graft.state.LogStore(spark, s"$dir/logs")
    // cacheSlice=false: every branch re-scans the live source (the
    // streaming-a-huge-backfill configuration), so the mid-run mutation
    // must be caught by count validation, not prevented by the cache
    val run = new graft.driver.IngestionRun(spark, s"$dir/lake", store, cacheSlice = false)
    val spec = IngestionSpec(9L, "table", "local", "db", "t", "mtime", "", 0, 1,
      "fs", "", "id", "lv", "t_lv", 0, Nil, "g")
    // a source mutating underneath the run: the phantom row materializes
    // ONLY while a file-write task evaluates the source (FileFormatWriter
    // on the task stack), so the counting actions see 1 row and the write
    // lands 2 — both inside the window the counts derived
    val unstable = spark.range(1).rdd.mapPartitions { _ =>
      new Iterator[(Long, java.sql.Timestamp)] {
        private var emitted = 0
        // write frames only exist while the sink CONSUMES the iterator —
        // check at hasNext time, not iterator-creation time
        private def consumedByWriter = Thread.currentThread().getStackTrace.exists(f =>
          f.getClassName.contains("FileFormat") || f.getClassName.contains("WriteFiles"))
        override def hasNext: Boolean =
          emitted == 0 || (emitted == 1 && consumedByWriter)
        override def next(): (Long, java.sql.Timestamp) = {
          emitted += 1
          if (emitted == 1) (1L, java.sql.Timestamp.valueOf("2023-01-10 00:00:00"))
          else (2L, java.sql.Timestamp.valueOf("2023-01-05 00:00:00"))
        }
      }
    }
    val src = spark.createDataFrame(unstable).toDF("id", "mtime")
    val logs = run.run(spec, src)
    assert(logs.last.executionStatus == RunStatus.ValidationFailure)
    assert(logs.last.reasonCode.contains("rolled back"))
    // rollback removed the phantom write; the lake dir holds no data files
    assert(Rollback.listFiles(spark, s"$dir/lake/db/t")
      .count(_.endsWith(".parquet")) == 0)
  }

  test("with the default cached slice, a mid-run source mutation is snapshot-isolated away") {
    import org.apache.spark.sql.functions._
    import graft.model._
    val dir = java.nio.file.Files.createTempDirectory("graft-snap").toString
    val store = new graft.state.LogStore(spark, s"$dir/logs")
    val run = new graft.driver.IngestionRun(spark, s"$dir/lake", store)
    val spec = IngestionSpec(9L, "table", "local", "db", "t", "mtime", "", 0, 1,
      "fs", "", "id", "lv", "t_lv", 0, Nil, "g")
    // same phantom-while-written source as above: with the slice persisted
    // on first materialization, the write consumes the CACHED snapshot, so
    // the phantom never lands and the run validates clean
    val unstable = spark.range(1).rdd.mapPartitions { _ =>
      new Iterator[(Long, java.sql.Timestamp)] {
        private var emitted = 0
        private def consumedByWriter = Thread.currentThread().getStackTrace.exists(f =>
          f.getClassName.contains("FileFormat") || f.getClassName.contains("WriteFiles"))
        override def hasNext: Boolean =
          emitted == 0 || (emitted == 1 && consumedByWriter)
        override def next(): (Long, java.sql.Timestamp) = {
          emitted += 1
          if (emitted == 1) (1L, java.sql.Timestamp.valueOf("2023-01-10 00:00:00"))
          else (2L, java.sql.Timestamp.valueOf("2023-01-05 00:00:00"))
        }
      }
    }
    val src = spark.createDataFrame(unstable).toDF("id", "mtime")
    // outside a write, the iterator emits exactly one row per partition —
    // this is the stable row count the snapshot should pin
    val stableCount = src.count()
    val logs = run.run(spec, src)
    assert(logs.last.executionStatus == RunStatus.Success)
    // no phantom rows landed: the write consumed the cached snapshot (an
    // uncached write would have doubled every partition)
    assert(spark.read.parquet(s"$dir/lake/db/t").count() == stableCount)
  }
}
