package graft.sink

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compaction shrinks file count, preserves rows and partition layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // simulate chunked appends: 10 small writes into 2 partitions
    (1 to 10).foreach { i =>
      Seq((i.toLong, i % 2, s"v$i")).toDF("id", "p", "v")
        .write.mode("append").partitionBy("p").parquet(dir)
    }
    val before = Rollback.listFiles(spark, dir).count(_.endsWith(".parquet"))
    assert(before >= 10)
    val rows = Compaction.compactTable(spark, dir, partitionCols = Seq("p"),
      clusterBy = Some("id"), targetRowsPerFile = 1000)
    assert(rows == 10)
    val after = Rollback.listFiles(spark, dir).count(_.endsWith(".parquet"))
    assert(after < before && after <= 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 10)
    assert(back.select($"p").distinct().as[Int].collect().toSet == Set(0, 1))
    assert(back.select($"id").as[Long].collect().toSet == (1L to 10L).toSet)
  }

  test("schema evolution: a column added between runs merges on read") {
    import graft.model._
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    val store = new graft.state.LogStore(spark, s"$dir/logs")
    val run = new graft.driver.IngestionRun(spark, s"$dir/lake", store)
    val spec = IngestionSpec(5L, "table", "l", "db", "t", "mtime", "", 0, 1, "fs", "",
      "id", "lv", "t_lv", 0, Nil, "g")
    val v1 = Seq((1L, "2023-01-01 00:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("mtime"))
    assert(run.run(spec, v1).last.executionStatus == RunStatus.Success)
    // source evolves: gains a column
    val v2 = Seq((2L, "2023-02-01 00:00:00", "new")).toDF("id", "s", "extra")
      .select($"id", to_timestamp($"s").as("mtime"), $"extra")
    assert(run.run(spec, v2).last.executionStatus == RunStatus.Success)
    val lake = spark.read.option("mergeSchema", "true").parquet(s"$dir/lake/db/t")
    assert(lake.columns.toSet == Set("id", "mtime", "extra"))
    val byId = lake.select($"id", $"extra").as[(Long, Option[String])].collect().toMap
    assert(byId(1L).isEmpty && byId(2L).contains("new"))
  }
}
