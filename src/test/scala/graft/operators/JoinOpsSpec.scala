package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  test("asofPrior: latest strictly-earlier right row per key; nulls before any") {
    val left = Seq(
      (1L, 100L, "2021-01-10"), (2L, 100L, "2021-03-10"), (3L, 100L, "2021-01-01"),
      (4L, 200L, "2021-05-01"),
    ).toDF("id", "k", "d").select($"id", $"k", to_date($"d").as("t"))
    val right = Seq(
      (100L, "2021-01-01", "a"), (100L, "2021-02-01", "b"), (100L, "2021-01-10", "x"),
      (200L, "2021-06-01", "late"),
    ).toDF("k", "d", "v").select($"k", to_date($"d").as("t"), $"v")

    val got = AsofJoin.asofPrior(left, right, Seq("k"), "t", "t", Seq("v"))
      .select($"id", $"__asof.v".as("v")).as[(Long, Option[String])]
      .collect().toMap
    assert(got(1L).contains("a"))  // 01-10 left: strictly-earlier best is 01-01 (01-10 right excluded)
    assert(got(2L).contains("b"))  // 03-10: latest earlier is 02-01
    assert(got(3L).isEmpty)        // nothing earlier
    assert(got(4L).isEmpty)        // right row is later
  }

  test("asofPrior tie-break picks the largest tieBreak among equal timestamps") {
    val left = Seq((1L, 9L, "2021-02-01")).toDF("id", "k", "d")
      .select($"id", $"k", to_date($"d").as("t"))
    val right = Seq((9L, "2021-01-01", 5L, "low"), (9L, "2021-01-01", 7L, "high"))
      .toDF("k", "d", "seq", "v").select($"k", to_date($"d").as("t"), $"seq", $"v")
    val got = AsofJoin.asofPrior(left, right, Seq("k"), "t", "t", Seq("v"), tieBreak = Some("seq"))
      .select($"__asof.v").as[String].head()
    assert(got == "high")
  }

  test("saltedJoin equals the plain join on skewed data") {
    val left = (1 to 2000).map(i => (if (i % 10 == 0) 1L else i.toLong, i.toLong))
      .toDF("k", "uid") // key 1 is hot
    val right = Seq((1L, "hot"), (2L, "a"), (3L, "b")).toDF("k", "v")
    val plain = left.join(right, Seq("k")).select($"uid", $"v")
    val salted = SkewJoin.saltedJoin(left, right, "k", "uid", 8).select($"uid", $"v")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("saltedJoin left_outer keeps unmatched left rows exactly once") {
    val left = Seq((1L, 10L), (99L, 11L)).toDF("k", "uid")
    val right = Seq((1L, "x")).toDF("k", "v")
    val got = SkewJoin.saltedJoin(left, right, "k", "uid", 4, "left_outer")
      .select($"uid", $"v").as[(Long, Option[String])].collect().toSet
    assert(got == Set((10L, Some("x")), (11L, None)))
  }
}
