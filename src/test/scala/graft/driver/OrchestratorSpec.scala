package graft.driver

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.state.LogStore

class OrchestratorSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent multi-spec run: independent lakes, contained failures, inactive skipped") {
    val dir = java.nio.file.Files.createTempDirectory("graft-orch").toString
    val store = new LogStore(spark, s"$dir/logs")
    val orch = new Orchestrator(spark, s"$dir/lake", store, parallelism = 4)

    def spec(id: Long, table: String, active: Int = 1) = IngestionSpec(
      id, "table", "l", "db", table, "mtime", "", 0, active, "fs", "",
      "id", "lv", s"${table}_lv", 0, Nil, "g")
    def src(n: Int) = (1 to n).map(i => (i.toLong, f"2023-01-$i%02d 00:00:00"))
      .toDF("id", "s").select($"id", to_timestamp($"s").as("mtime"))

    val specs = Seq(spec(1, "t1"), spec(2, "t2"), spec(3, "t_broken"),
      spec(4, "t_inactive", active = 0))
    val statuses = orch.runAll(specs, {
      case s if s.tablename == "t_broken" => sys.error("source unavailable")
      case s if s.tablename == "t1"       => src(5)
      case _                              => src(3)
    })

    assert(statuses == Map(1L -> RunStatus.Success, 2L -> RunStatus.Success,
      3L -> RunStatus.ExtractionFailure))
    assert(spark.read.parquet(s"$dir/lake/db/t1").count() == 5)
    assert(spark.read.parquet(s"$dir/lake/db/t2").count() == 3)
    assert(!new java.io.File(s"$dir/lake/db/t_inactive").exists())
    // the failure was logged with the reference's reason code shape
    val failLog = store.forIngestion(3L).collect()
    assert(failLog.length == 1 && failLog.head.reasonCode.startsWith("exception-occured"))
  }
}
