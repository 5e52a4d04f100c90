package graft.state

import java.sql.Timestamp

import graft.SparkSpec
import graft.model.{ReasonCode, RunLog, RunStatus}

class LogStoreSpec extends SparkSpec {

  private def log(status: String, end: String): RunLog =
    RunLog(1L, status, "x", end, 10L, 10L, "r", new Timestamp(0L))

  test("first run defaults: datetime mode") {
    val (start, reason) = LogStore.nextStartValue(Nil, dateNotAvailable = false)
    assert(start == "2020-01-01 00:00:00" && reason == ReasonCode.FirstTime)
  }

  test("first run defaults: int mode") {
    val (start, reason) = LogStore.nextStartValue(Nil, dateNotAvailable = true)
    assert(start == "1" && reason == ReasonCode.FirstTime)
  }

  test("datetime watermark bumps +1 second over max success end_value") {
    val prior = Seq(
      log(RunStatus.Success, "2023-05-01 10:00:00"),
      log(RunStatus.Success, "2023-06-01 10:00:59"),
      log(RunStatus.Failed, "2024-01-01 00:00:00"), // ignored: not success
    )
    val (start, reason) = LogStore.nextStartValue(prior, dateNotAvailable = false)
    assert(start == "2023-06-01 10:01:00" && reason == ReasonCode.Subsequent)
  }

  test("int watermark bumps +1") {
    val prior = Seq(log(RunStatus.Success, "41"), log(RunStatus.Success, "7"))
    val (start, _) = LogStore.nextStartValue(prior, dateNotAvailable = true)
    assert(start == "42")
  }

  test("non-inclusive bump keeps the boundary value (principled > semantics)") {
    val prior = Seq(log(RunStatus.Success, "2023-05-01 10:00:00"))
    val (start, _) =
      LogStore.nextStartValue(prior, dateNotAvailable = false, inclusiveBump = false)
    assert(start == "2023-05-01 10:00:00")
  }

  test("append + read round-trips through parquet; missing path is empty") {
    val dir = java.nio.file.Files.createTempDirectory("graft-log").toString
    val store = new LogStore(spark, s"$dir/logs")
    assert(store.read().isEmpty)
    store.append(Seq(log(RunStatus.Success, "5")))
    store.append(Seq(log(RunStatus.Failed, "6")))
    val rows = store.forIngestion(1L).collect()
    assert(rows.length == 2 && rows.map(_.endValue).toSet == Set("5", "6"))
  }
}
