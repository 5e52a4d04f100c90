package graft.driver

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.sink.TxTable
import graft.state.LogStore

/** The ingestion lifecycle on a transactional lake: loads are staged,
  * validated, then committed — a failing validation (or a crash) leaves
  * the committed state untouched with ZERO cleanup machinery.
  */
class TxIngestionSpec extends SparkSpec {
  import spark.implicits._

  private def mkSpec(parts: Seq[PartitionSpec]) = IngestionSpec(
    lakeIngestionId = 21L, ingestionType = "table", servername = "local",
    databasename = "txdb", tablename = "tx_tbl",
    deltaField = "mtime", deltaFieldExpr = "", dateNotAvailable = 0,
    activeIndicator = 1, targetType = "fs", targetLocation = "",
    primaryKey = "id", viewDb = "lv", viewName = "tx_tbl_lv",
    viewNeeded = 0, partitions = parts, dagGroup = "g1")

  private def srcRows(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "v", "s").select($"id", $"v", to_timestamp($"s").as("mtime"))

  test("full lifecycle on a TxTable lake: one commit per successful load, partition columns intact") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txing").toString
    val store = new LogStore(spark, s"$dir/logs")
    val run = new IngestionRun(spark, s"$dir/lake", store, txLake = true)
    val spec = mkSpec(Seq(PartitionSpec(1, PartitionSpec.TimeBased, "mtime", "YYYYMM")))
    val table = s"$dir/lake/txdb/tx_tbl"

    val logs1 = run.run(spec, srcRows(Seq(
      (1L, "a", "2023-01-10 10:00:00"), (2L, "b", "2023-02-10 10:00:00"))))
    assert(logs1.last.executionStatus == RunStatus.Success)
    assert(TxTable.commits(spark, table).map(_.version) == Seq(1L))

    val lake1 = TxTable.read(spark, table)
    assert(lake1.count() == 2)
    assert(lake1.columns.contains("mtime_YYYYMM"), "derived partition column must survive the tx read")
    assert(lake1.filter($"mtime_YYYYMM" === "202302").count() == 1)

    // incremental second run: one more commit, only new rows
    val logs2 = run.run(spec, srcRows(Seq(
      (1L, "a", "2023-01-10 10:00:00"), (3L, "c", "2023-03-01 00:00:00"))))
    assert(logs2.last.executionStatus == RunStatus.Success)
    assert(logs2.last.sourceCount == 1L)
    assert(TxTable.commits(spark, table).map(_.version) == Seq(1L, 2L))
    assert(TxTable.read(spark, table).count() == 3)

    // no-data third run: no commit
    assert(run.run(spec, srcRows(Seq((1L, "a", "2023-01-10 10:00:00"))))
      .map(_.executionStatus) == Seq(RunStatus.NoData))
    assert(TxTable.commits(spark, table).size == 2)
  }

  test("mid-run source mutation: validation fails, NOTHING is committed, no staged leftovers, next run clean") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txrb").toString
    val store = new LogStore(spark, s"$dir/logs")
    val run = new IngestionRun(spark, s"$dir/lake", store, cacheSlice = false, txLake = true)
    val spec = mkSpec(Nil)
    val table = s"$dir/lake/txdb/tx_tbl"

    // SinkSpec's adversarial source: a phantom row that materializes only
    // while a file-write task consumes the iterator
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
    val bad = spark.createDataFrame(unstable).toDF("id", "mtime")
    val logs = run.run(spec, bad)
    assert(logs.last.executionStatus == RunStatus.ValidationFailure)
    assert(logs.last.reasonCode.contains("nothing committed"))
    assert(TxTable.commits(spark, table).isEmpty, "failed validation must not commit")
    assert(TxTable.read(spark, table).count() == 0)
    // the staged batch was dropped on the spot — vacuum finds nothing
    assert(TxTable.vacuum(spark, table, minAgeMs = 0L).isEmpty)

    // a well-behaved run afterwards starts from a clean slate
    val good = run.run(spec, srcRows(Seq((1L, "a", "2023-01-10 00:00:00"))))
    assert(good.last.executionStatus == RunStatus.Success)
    assert(TxTable.read(spark, table).count() == 1)
  }

  test("a crashed run's staged orphan neither pollutes reads nor counts as lake existence") {
    val dir = java.nio.file.Files.createTempDirectory("graft-txorph").toString
    val store = new LogStore(spark, s"$dir/logs")
    val run = new IngestionRun(spark, s"$dir/lake", store, txLake = true)
    val spec = mkSpec(Nil)
    val table = s"$dir/lake/txdb/tx_tbl"
    // simulate: a prior run died after staging, before validation
    srcRows(Seq((99L, "zombie", "2023-01-01 00:00:00")))
      .write.parquet(s"$table/batch-crashed")

    val logs = run.run(spec, srcRows(Seq((1L, "a", "2023-01-10 00:00:00"))))
    assert(logs.last.executionStatus == RunStatus.Success)
    val lake = TxTable.read(spark, table)
    assert(lake.count() == 1, "orphan rows must stay invisible")
    assert(lake.filter($"id" === 99L).count() == 0)
  }
}
