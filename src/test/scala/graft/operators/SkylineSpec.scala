package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** 2-D Pareto skyline vs the naive domination reference. */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def sky(rows: (Long, Long, Long)*): Set[(Long, Long, Long)] =
    Skyline.pareto2D(rows.toDF("id", "x", "y"), col("id"), col("x"), col("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("hand case: staircase survives, interior points dominated") {
    val out = sky((1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L), // staircase
      (4L, 4L, 4L), (5L, 1L, 1L))                              // dominated
    assert(out == Set((1L, 10L, 1L), (2L, 5L, 5L), (3L, 1L, 10L)))
  }

  test("exact duplicates of a skyline point all survive") {
    val out = sky((1L, 5L, 5L), (2L, 5L, 5L), (3L, 1L, 1L))
    assert(out == Set((1L, 5L, 5L), (2L, 5L, 5L)))
  }

  test("same x: only the max-y row survives; same y: only max-x") {
    val out = sky((1L, 5L, 3L), (2L, 5L, 7L), (3L, 2L, 7L))
    assert(out == Set((2L, 5L, 7L)))
  }

  test("matches the quadratic domination reference on a deterministic cloud") {
    val pts = (1L to 300L).map(i => (i, (i * 37) % 50, (i * 91) % 50))
    val ref = pts.filter { case (_, px, py) =>
      !pts.exists { case (_, qx, qy) =>
        qx >= px && qy >= py && (qx > px || qy > py) }
    }.toSet
    val got = sky(pts: _*).map(t => (t._1, t._2, t._3))
    assert(got == ref)
  }
}
