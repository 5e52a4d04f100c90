package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ScalableNtile must be bit-identical to the window-form ntile AND plan
  * with no single-partition exchange (the whole point of the rewrite).
  */
class ScalableNtileSpec extends SparkSpec {
  import spark.implicits._

  private def reference(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select($"id", ntile(n).over(Window.orderBy($"v".asc, $"id".asc)).as("tile"))

  private def check(rows: Seq[(Long, Double)], n: Int, coarse: Int = 16): Unit = {
    val df = rows.toDF("id", "v")
    val got = ScalableNtile.ntileByRange(df, n, $"v", Seq($"id"), coarse)
      .select($"id", $"__graft_ntile".as("tile"))
    val want = reference(df, n)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"mismatch for n=$n rows=${rows.size}")
  }

  test("matches window ntile: divisible, non-divisible, ties, N < n") {
    val rng = new scala.util.Random(7)
    val base = (1L to 100L).map(i => (i, rng.nextInt(20).toDouble)) // heavy ties
    check(base, 4)       // 100 % 4 == 0
    check(base.take(97), 4) // 97 % 4 == 1 → first tile padded
    check(base.take(3), 7)  // N < n → tile == rank
    check(base, 7, coarse = 3) // more tiles than coarse buckets
    check(Seq((1L, 5.0)), 4)
  }

  test("constant value column: everything lands in one coarse bucket, still correct") {
    check((1L to 10L).map(i => (i, 1.0)), 3)
  }

  test("randomized equivalence with the window form (seeded: sizes x tiles x coarse)") {
    val rng = new scala.util.Random(99)
    for ((n, tiles, coarse) <- Seq((37, 5, 4), (250, 8, 64), (64, 64, 2), (11, 2, 1024))) {
      val rows = (1L to n.toLong).map(i => (i, rng.nextInt(40).toDouble))
      check(rows, tiles, coarse)
    }
  }

  test("null order values take the lowest ranks, matching the window form") {
    val rows = Seq[(Long, java.lang.Double)](
      (1L, 5.0), (2L, null), (3L, 1.0), (4L, null), (5L, 9.0), (6L, 3.0), (7L, 7.0))
    val df = rows.toDF("id", "v")
    val got = ScalableNtile.ntileByRange(df, 3, $"v", Seq($"id"), coarse = 4)
      .select($"id", $"__graft_ntile".as("tile"))
    val want = reference(df, 3)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  test("all-NULL order column still deals tiles 1..n like the window form") {
    val rows = (1L to 7L).map(i => (i, null: java.lang.Double))
    val df = rows.toDF("id", "v")
    val got = ScalableNtile.ntileByRange(df, 3, $"v", Seq($"id"), coarse = 4)
      .select($"id", $"__graft_ntile".as("tile"))
    val want = reference(df, 3)
    assert(got.except(want).isEmpty && want.except(got).isEmpty)
  }

  private def referenceGrouped(df: org.apache.spark.sql.DataFrame, n: Int) =
    df.select($"id", $"g",
      ntile(n).over(Window.partitionBy($"g").orderBy($"v".asc, $"id".asc)).as("tile"))

  private def checkGrouped(rows: Seq[(Long, String, java.lang.Double)], n: Int,
                           coarse: Int = 16): Unit = {
    val df = rows.toDF("id", "g", "v")
    val got = ScalableNtile.ntileByRangeGrouped(df, n, $"v", $"g", Seq($"id"), coarse)
      .select($"id", $"g", $"__graft_ntile".as("tile"))
    val want = referenceGrouped(df, n)
    assert(got.except(want).isEmpty && want.except(got).isEmpty,
      s"grouped mismatch for n=$n rows=${rows.size}")
  }

  test("grouped form matches window PARTITION BY ntile: skewed, tied, tiny groups") {
    val rng = new scala.util.Random(41)
    // one dominant group (the motivating skew), one tiny, one mid, heavy ties
    val rows: Seq[(Long, String, java.lang.Double)] =
      (1L to 200L).map(i => (i, "big", rng.nextInt(15).toDouble: java.lang.Double)) ++
      (201L to 203L).map(i => (i, "tiny", rng.nextInt(15).toDouble: java.lang.Double)) ++
      (204L to 240L).map(i => (i, "mid", rng.nextInt(15).toDouble: java.lang.Double))
    checkGrouped(rows, 3)
    checkGrouped(rows, 7, coarse = 4)
    checkGrouped(rows, 64, coarse = 2) // tiles ≫ group sizes
  }

  test("grouped form: null groups and null values match the window form") {
    val rows: Seq[(Long, String, java.lang.Double)] = Seq(
      (1L, null, 5.0), (2L, null, null), (3L, "a", 1.0), (4L, "a", null),
      (5L, "a", 9.0), (6L, null, 3.0), (7L, "b", 7.0), (8L, "b", 7.0),
      (9L, "b", 7.0), (10L, "b", null))
    checkGrouped(rows, 3, coarse = 4)
  }

  test("grouped plan has no single-partition exchange and no per-group global sort") {
    val df = (1L to 1000L).map(i => (i, s"g${i % 3}", (i * 37 % 101).toDouble))
      .toDF("id", "g", "v")
    val got = ScalableNtile.ntileByRangeGrouped(df, 4, $"v", $"g", Seq($"id"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition stage:\n$plan")
  }

  test("plan has no single-partition exchange") {
    val df = (1L to 1000L).map(i => (i, (i * 37 % 101).toDouble)).toDF("id", "v")
    val got = ScalableNtile.ntileByRange(df, 4, $"v", Seq($"id"))
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"single-partition stage:\n$plan")
    // the window that remains is partitioned by the coarse bucket
    assert(plan.contains("Window"), "expected a (partitioned) window")
  }
}
