package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GapFillSpec extends SparkSpec {
  import spark.implicits._

  // (key, us, tie, v): step size 10 → steps are us div 10
  private val events = Seq(
    (1L, 5L, 100L, 10L),   // step 0
    (1L, 17L, 101L, 20L),  // step 1
    (1L, 19L, 102L, 30L),  // step 1 — later ts wins
    (1L, 43L, 103L, 40L),  // step 4 (steps 2,3 are gaps → carry 30)
    (2L, 25L, 104L, 70L)   // single-step key
  ).toDF("k", "us", "tie", "v")

  private def run(df: org.apache.spark.sql.DataFrame, cap: Long = 1L << 20) =
    GapFill.locf(df, col("k"), col("us"), col("tie"), col("v"),
        stepUs = 10, maxSteps = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3))).toSet

  test("gaps carry the last observation; within-step ties break by ts") {
    assert(run(events) == Set(
      (1L, 0L, 10L, true),
      (1L, 1L, 30L, true),  // 19 beats 17
      (1L, 2L, 30L, false),
      (1L, 3L, 30L, false),
      (1L, 4L, 40L, true),
      (2L, 2L, 70L, true)))
  }

  test("within-step exact-ts ties break by the tie column") {
    val tied = Seq((1L, 5L, 9L, 11L), (1L, 5L, 8L, 22L)).toDF("k", "us", "tie", "v")
    assert(run(tied) == Set((1L, 0L, 11L, true))) // higher tie wins
  }

  test("grid-size tripwire fails loudly") {
    val wide = Seq((1L, 0L, 1L, 1L), (1L, 1000L, 2L, 2L)).toDF("k", "us", "tie", "v")
    val e = intercept[Exception](run(wide, cap = 10))
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("grid steps")))
  }

  test("empty input, null keys dropped") {
    assert(run(Seq.empty[(Long, Long, Long, Long)].toDF("k", "us", "tie", "v")).isEmpty)
    val withNull = Seq((Option.empty[Long], 5L, 1L, 1L), (Some(3L), 5L, 2L, 9L))
      .toDF("k", "us", "tie", "v")
    assert(run(withNull) == Set((3L, 0L, 9L, true)))
  }

  test("partitioning-invariant") {
    val big = (1 to 300).map(i => ((i % 7).toLong, (i * 13 % 200).toLong, i.toLong, i.toLong))
    val r1 = run(big.toDF("k", "us", "tie", "v").repartition(1))
    val r8 = run(big.toDF("k", "us", "tie", "v").repartition(8))
    assert(r1 == r8 && r1.nonEmpty)
  }
}
