package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model.PartitionSpec

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("clampTimestamp clamps below/above and passes through in-range") {
    val df = Seq("1800-01-01 00:00:00", "2021-06-15 12:00:00", "9999-01-01 00:00:00")
      .toDF("s").select(to_timestamp($"s").as("ts"))
    val got = df.select(date_format(
      Transforms.clampTimestamp($"ts", "1900-01-01 00:00:00", "2262-04-11 00:00:00"),
      "yyyy-MM-dd").as("d")).as[String].collect().toSeq
    assert(got == Seq("1900-01-01", "2021-06-15", "2262-04-11"))
  }

  test("clamp is idempotent") {
    val df = Seq("1800-01-01 00:00:00", "2021-06-15 12:00:00").toDF("s")
      .select(to_timestamp($"s").as("ts"))
    def c(x: org.apache.spark.sql.Column) =
      Transforms.clampTimestamp(x, "1900-01-01 00:00:00", "2262-04-11 00:00:00")
    val twice = df.select(c(c($"ts")).as("a"), c($"ts").as("b"))
      .filter($"a" =!= $"b").count()
    assert(twice == 0)
  }

  test("time-based partition derivation: YYYYMMDD / YYYYMM / YYYY") {
    val df = Seq("2021-06-15 12:34:56").toDF("s").select(to_timestamp($"s").as("created"))
    def derive(fmt: String) = {
      val spec = PartitionSpec(1, PartitionSpec.TimeBased, "created", fmt)
      val (out, cols) = Transforms.derivePartitions(df, Seq(spec))
      (cols.head, out.select(col(cols.head).cast("string")).as[String].head())
    }
    assert(derive("YYYYMMDD") == ("created_YYYYMMDD", "20210615"))
    assert(derive("YYYYMM") == ("created_YYYYMM", "202106"))
    assert(derive("YYYY") == ("created_YYYY", "2021"))
  }

  test("non-time partition derivation: 1M integer range bucket") {
    val df = Seq(0L, 999999L, 1000000L, 2500000L).toDF("id")
    val spec = PartitionSpec(1, PartitionSpec.NonTimeBased, "id", "1M")
    val (out, cols) = Transforms.derivePartitions(df, Seq(spec))
    assert(cols == Seq("id_range"))
    assert(out.select(col("id_range")).as[Long].collect().toSeq == Seq(0L, 0L, 1L, 2L))
  }

  test("bucketWidth parses 1M / 100K / plain ints and rejects junk") {
    assert(Transforms.bucketWidth("1M") == 1000000L)
    assert(Transforms.bucketWidth("100K") == 100000L)
    assert(Transforms.bucketWidth("5000") == 5000L)
    intercept[Exception](Transforms.bucketWidth("YYYYMMDD HH"))
  }

  test("multi-spec derivation is ordered by seq_no") {
    val df = Seq((1500000L, "2021-06-15 12:00:00")).toDF("id", "s")
      .select($"id", to_timestamp($"s").as("created"))
    val specs = Seq(
      PartitionSpec(2, PartitionSpec.NonTimeBased, "id", "1M"),
      PartitionSpec(1, PartitionSpec.TimeBased, "created", "YYYY"))
    val (_, cols) = Transforms.derivePartitions(df, specs)
    assert(cols == Seq("created_YYYY", "id_range"))
  }
}
