package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the codegen IntSqDist kernel to the lambda composition it
  * replaced: identical values on random fixed-point vectors (exact
  * integer arithmetic — any divergence is a bug, not drift), and the
  * same null contract (mismatched lengths → NULL, null element → NULL).
  */
class IntSqDistSpec extends SparkSpec {
  import spark.implicits._

  private def lambdaForm = (a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =>
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0L), (acc, e) => acc + e)

  test("matches the lambda composition on random fixed-point vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)(
      (Array.fill(64)(rnd.nextLong() % (1L << 21)),
        Array.fill(64)(rnd.nextLong() % (1L << 21))))
    val df = rows.toDF("a", "b")
    val diff = df.select(
        IntSqDist.intSqDist($"a", $"b").as("k"),
        lambdaForm($"a", $"b").as("l"))
      .filter($"k" =!= $"l" || $"k".isNull || $"l".isNull)
    assert(diff.count() === 0)
  }

  test("hand-checked value") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 0L, 3L))).toDF("a", "b")
    // (1-4)² + (2-0)² + (3-3)² = 9 + 4 + 0
    assert(df.select(IntSqDist.intSqDist($"a", $"b")).as[Long].head() === 13L)
  }

  test("mismatched lengths and null elements yield NULL (the lambda contract)") {
    val df = Seq(
      (Array[java.lang.Long](1L, 2L), Array[java.lang.Long](1L, 2L, 3L)),
      (Array[java.lang.Long](1L, null), Array[java.lang.Long](1L, 2L))
    ).toDF("a", "b")
    val got = df.select(IntSqDist.intSqDist($"a", $"b").as("k"))
      .select($"k".isNull).as[Boolean].collect().toSeq
    assert(got === Seq(true, true))
  }
}
