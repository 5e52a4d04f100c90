package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.PartitionSpec

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("latestPerKey: one row per key, greatest ordering wins, tie-break deterministic") {
    val df = Seq(
      (1L, "old", "2023-01-01 00:00:00", 10L),
      (1L, "new", "2023-02-01 00:00:00", 11L),
      (2L, "a", "2023-01-01 00:00:00", 20L),
      (2L, "b", "2023-01-01 00:00:00", 21L), // ts tie → higher id wins
    ).toDF("k", "v", "s", "id").select($"k", $"v", to_timestamp($"s").as("ts"), $"id")
    val got = LatestRowView.latestPerKey(df, Seq("k"), Seq($"ts", $"id"))
      .select($"k", $"v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "new", 2L -> "b"))
  }

  test("viewDdl golden text") {
    val ddl = LatestRowView.viewDdl("lv_db", "t_lv", "db", "t", Seq("id"), "mtime")
    assert(ddl ==
      """CREATE OR REPLACE VIEW lv_db.t_lv AS
        |SELECT * FROM (
        |  SELECT *, row_number() OVER (PARTITION BY id ORDER BY mtime DESC) AS row_num
        |  FROM db.t
        |) WHERE row_num = 1""".stripMargin)
  }

  test("reconcileCounts matches and mismatches") {
    val lake = Seq((1L, "2023-01-01 00:00:00"), (2L, "2023-06-01 00:00:00"))
      .toDF("id", "s").select($"id", to_timestamp($"s").as("mtime"))
    val (n, ok) = Validation.reconcileCounts(lake, "mtime",
      "2023-01-01 00:00:00", "2023-12-31 00:00:00", 2L)
    assert(n == 2L && ok)
    val (_, bad) = Validation.reconcileCounts(lake, "mtime",
      "2023-05-01 00:00:00", "2023-12-31 00:00:00", 2L)
    assert(!bad)
  }

  test("validatePartitionSpecs status codes and rejections") {
    assert(Validation.validatePartitionSpecs(Nil) == Right(1))
    assert(Validation.validatePartitionSpecs(
      Seq(PartitionSpec(1, PartitionSpec.NonTimeBased, "id", "1M"))) == Right(2))
    assert(Validation.validatePartitionSpecs(
      Seq(PartitionSpec(1, PartitionSpec.TimeBased, "c", "YYYYMM"))) == Right(3))
    assert(Validation.validatePartitionSpecs(
      Seq(PartitionSpec(1, PartitionSpec.TimeBased, "c", "YYYYMMDD HH24"))).isLeft)
    assert(Validation.validatePartitionSpecs(
      Seq(PartitionSpec(1, PartitionSpec.TimeBased, "a,b", "YYYY"))).isLeft)
  }
}
