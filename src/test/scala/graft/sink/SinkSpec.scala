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

  test("validation failure rolls the lake back to its pre-run state") {
    import org.apache.spark.sql.functions._
    import graft.model._
    // a source whose delta expression lies (coalesce column outside the
    // window) to force a count mismatch is hard to fabricate through the
    // public API; instead assert the rollback path via a doctored lake:
    // write run 1, corrupt the lake by appending a foreign file, then
    // check reconcile failure semantics directly
    val dir = java.nio.file.Files.createTempDirectory("graft-rbrun").toString
    val store = new graft.state.LogStore(spark, s"$dir/logs")
    val run = new graft.driver.IngestionRun(spark, s"$dir/lake", store)
    val spec = IngestionSpec(9L, "table", "local", "db", "t", "mtime", "", 0, 1,
      "fs", "", "id", "lv", "t_lv", 0, Nil, "g")
    val src = Seq((1L, "2023-01-01 10:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
    val logs = run.run(spec, src)
    assert(logs.last.executionStatus == RunStatus.Success)
    // plant a foreign row INSIDE the next run's validation window
    // (watermark .. max delta) → target count exceeds source count
    val lakeDir = s"$dir/lake/db/t"
    Seq((99L, "2023-01-15 00:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
      .write.mode("append").parquet(lakeDir)
    val before = Rollback.listFiles(spark, lakeDir)
    val src2 = Seq((1L, "2023-01-01 10:00:00"), (2L, "2023-02-01 10:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
    val logs2 = run.run(spec, src2)
    assert(logs2.last.executionStatus == RunStatus.ValidationFailure)
    assert(logs2.last.reasonCode.contains("rolled back"))
    // the run's own files were deleted; the doctored pre-run state remains
    assert(Rollback.listFiles(spark, lakeDir) == before)
  }
}
