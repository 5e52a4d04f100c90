package graft.driver

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.state.LogStore

class DagGenSpec extends SparkSpec {
  import spark.implicits._

  private def mkSpec(id: Long, group: String, table: String,
                     active: Int = 1, parts: Seq[PartitionSpec] = Nil) = IngestionSpec(
    lakeIngestionId = id, ingestionType = "table", servername = "local",
    databasename = "dagdb", tablename = table,
    deltaField = "mtime", deltaFieldExpr = "", dateNotAvailable = 0,
    activeIndicator = active, targetType = "fs", targetLocation = "",
    primaryKey = "id", viewDb = "lv", viewName = s"${table}_lv",
    viewNeeded = 0, partitions = parts, dagGroup = group)

  private def src(n: Int) = (1 to n).map(i => (i.toLong, s"v$i", "2023-01-01 10:00:00"))
    .toDF("id", "v", "s").select($"id", $"v", to_timestamp($"s").as("mtime"))

  test("plan groups by dagGroup into ordered stages; inactive specs drop out") {
    val specs = Seq(
      mkSpec(1, "g1", "t_a"), mkSpec(2, "g1", "t_b"), mkSpec(3, "g1", "t_c"),
      mkSpec(4, "g2", "t_d"), mkSpec(5, "g2", "t_off", active = 0))
    val plans = DagGen.plan(specs, stageOf = s => if (s.lakeIngestionId <= 2) 1 else 2,
      dependsOn = Map("g2" -> "g1"))
    assert(plans.map(_.group) == Seq("g1", "g2"))
    val g1 = plans.head
    assert(g1.stages.map(_.order) == Seq(1, 2))
    assert(g1.stages.head.specs.map(_.tablename) == Seq("t_a", "t_b"))
    assert(g1.stages(1).specs.map(_.tablename) == Seq("t_c"))
    assert(plans(1).dependsOn.contains("g1"))
    assert(plans(1).stages.flatMap(_.specs).map(_.tablename) == Seq("t_d"))
  }

  test("render emits the reference's dag_dict structure as JSON") {
    val plans = DagGen.plan(Seq(mkSpec(1, "dag_extract", "stg_x"), mkSpec(2, "dag_extract", "stg_y")),
      stageOf = s => s.lakeIngestionId.toInt)
    val json = DagGen.render(plans)
    assert(json.contains(""""dag_name":"dag_extract""""))
    assert(json.contains(""""1":["stg_x"]""") && json.contains(""""2":["stg_y"]"""))
    assert(json.contains(""""dependent_dag":"None""""))
    assert(json.contains(""""schedule":"0 8 * * *""""))
  }

  test("topoOrder respects dependencies and rejects cycles") {
    val plans = DagGen.plan(
      Seq(mkSpec(1, "a", "t1"), mkSpec(2, "b", "t2"), mkSpec(3, "c", "t3")),
      dependsOn = Map("a" -> "b", "b" -> "c"))
    assert(DagGen.topoOrder(plans).map(_.group) == Seq("c", "b", "a"))
    val cyclic = DagGen.plan(Seq(mkSpec(1, "a", "t1"), mkSpec(2, "b", "t2")),
      dependsOn = Map("a" -> "b", "b" -> "a"))
    intercept[IllegalArgumentException] { DagGen.topoOrder(cyclic) }
    // dangling edge (typo, or upstream fully inactive) must fail loudly,
    // not run the dependent DAG against an unpopulated lake
    val dangling = DagGen.plan(
      Seq(mkSpec(1, "g2", "t1"), mkSpec(2, "g1", "t_off", active = 0)),
      dependsOn = Map("g2" -> "g1"))
    intercept[IllegalArgumentException] { DagGen.topoOrder(dangling) }
  }

  test("executeStages halts later stages after a failure; executeAll skips dependent DAGs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dag").toString
    val store = new LogStore(spark, s"$dir/logs")
    val orch = new Orchestrator(spark, s"$dir/lake", store, parallelism = 2)
    val bad = Seq(PartitionSpec(1, PartitionSpec.TimeBased, "mtime", "YYYYMMDD HH")) // invalid
    val specs = Seq(
      mkSpec(1, "g1", "t_ok"),
      mkSpec(2, "g1", "t_bad", parts = bad), // fails stage 1
      mkSpec(3, "g1", "t_later"),            // stage 2: must be skipped
      mkSpec(4, "g2", "t_dep"))              // g2 depends on g1: must be skipped
    val plans = DagGen.plan(specs,
      stageOf = s => if (s.lakeIngestionId <= 2) 1 else 2,
      dependsOn = Map("g2" -> "g1"))
    val res = DagGen.executeAll(orch, plans, _ => src(3))
    assert(res(1L) == RunStatus.Success)
    assert(res(2L) == RunStatus.Failed)
    assert(res(3L) == "skipped:upstream-stage-failed")
    assert(res(4L) == "skipped:dependent-dag-failed")
    // the skipped specs never wrote to the lake
    assert(!new java.io.File(s"$dir/lake/dagdb/t_later").exists())
    assert(!new java.io.File(s"$dir/lake/dagdb/t_dep").exists())
  }

  test("executeAll with healthy DAGs runs everything in dependency order") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dag-ok").toString
    val store = new LogStore(spark, s"$dir/logs")
    val orch = new Orchestrator(spark, s"$dir/lake", store, parallelism = 2)
    val plans = DagGen.plan(
      Seq(mkSpec(1, "up", "t_u"), mkSpec(2, "down", "t_d")),
      dependsOn = Map("down" -> "up"))
    val res = DagGen.executeAll(orch, plans, _ => src(2))
    assert(res.values.toSeq == Seq(RunStatus.Success, RunStatus.Success))
    assert(spark.read.parquet(s"$dir/lake/dagdb/t_u").count() == 2)
    assert(spark.read.parquet(s"$dir/lake/dagdb/t_d").count() == 2)
  }
}
