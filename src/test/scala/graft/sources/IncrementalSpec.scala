package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  test("parseCoalesceExpr accepts the restricted grammar only") {
    assert(Incremental.parseCoalesceExpr("coalesce(modified_datetime, created_datetime)")
      .contains(("modified_datetime", "created_datetime")))
    assert(Incremental.parseCoalesceExpr("IFNULL(a,b)").contains(("a", "b")))
    assert(Incremental.parseCoalesceExpr("modified_datetime").isEmpty)
    assert(Incremental.parseCoalesceExpr("coalesce(a, b); DROP TABLE x").isEmpty)
  }

  test("pushdownWhere: plain column, open and windowed") {
    assert(Incremental.pushdownWhere("mtime", "2020-01-01 00:00:00", None, isDatetime = true)
      == "mtime >= '2020-01-01 00:00:00'")
    assert(Incremental.pushdownWhere("id", "5", Some("9"), isDatetime = false)
      == "id BETWEEN 5 AND 9")
  }

  test("pushdownWhere: coalesce expands to index-friendly OR (F3)") {
    val got = Incremental.pushdownWhere("coalesce(m, c)", "2020-01-01", Some("2020-01-02"),
      isDatetime = true)
    assert(got == "(m BETWEEN '2020-01-01' AND '2020-01-02' OR c BETWEEN '2020-01-01' AND '2020-01-02')")
  }

  test("coalesce-OR Column rewrite matches the coalesce predicate when fallback is non-null") {
    // contract: b (created) is non-null; a (modified) may be null
    val df = Seq(
      (Some("2021-01-05"), "2021-01-01"), // qualifies via a
      (None, "2021-01-06"),               // qualifies via b
      (Some("2020-12-01"), "2020-11-01"), // out of window
    ).toDF("a", "b")
      .select(to_date($"a").as("a"), to_date($"b").as("b"))
    val win = ("2021-01-01", "2021-01-31")
    val viaCoalesce = df.filter(coalesce($"a", $"b").between(win._1, win._2)).count()
    val viaOr = df.filter(Incremental.coalesceOrBetween(Seq($"a", $"b"), win._1, win._2)).count()
    // OR form is a superset by design (row 2 has a-null → b path; row 1 both)
    assert(viaCoalesce == 2 && viaOr == 2)
  }

  test("incrementalSlice filters on an expression delta") {
    val df = Seq((1L, "2021-01-01 00:00:00"), (2L, "2022-01-01 00:00:00"))
      .toDF("id", "s").select($"id", to_timestamp($"s").as("mtime"))
    val got = Incremental.incrementalSlice(df, "mtime", "2021-06-01 00:00:00")
      .select($"id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("deltaBounds: min/max/count in one pass; coalesce upper bound is least(max,max)") {
    val df = Seq(
      (Some("2021-01-05 00:00:00"), "2021-01-01 00:00:00"),
      (None, "2021-03-01 00:00:00"),
    ).toDF("m", "c")
      .select(to_timestamp($"m").as("m"), to_timestamp($"c").as("c"))
    val (lo, hi, n) = Incremental.deltaBounds(df, "coalesce(m, c)")
    assert(n == 2L)
    assert(lo.contains("2021-01-05 00:00:00"))
    // conservative watermark: least(max(m)=01-05, max(c)=03-01) = 01-05
    assert(hi.contains("2021-01-05 00:00:00"))
  }

  test("jdbcOptions synthesizes a pushdown subquery with partitioned-read bounds") {
    val opts = Incremental.jdbcOptions("jdbc:mysql://h/db", "db", "t",
      Seq("id", "v"), "id >= 5", "id", "5", "100", numPartitions = 4)
    assert(opts("dbtable") == "(SELECT id, v FROM db.t WHERE id >= 5) AS graft_src")
    assert(opts("partitionColumn") == "id" && opts("numPartitions") == "4")
  }
}
