package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Each DQ rule on crafted violations and on clean data. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Long =
    df.head().getLong(0)

  test("pkViolations counts EXTRA rows, not keys") {
    val df = Seq(1L, 2L, 2L, 2L, 3L).toDF("k")
    assert(one(DataQuality.pkViolations(df, col("k"))) == 2L) // 3 copies -> 2 extra
    assert(one(DataQuality.pkViolations(Seq(1L, 2L).toDF("k"), col("k"))) == 0L)
  }

  test("fdViolations counts lhs groups with >1 distinct rhs; nulls are a value") {
    val df = Seq((1L, "a"), (1L, "a"), (2L, "a"), (2L, "b"), (3L, "c"))
      .toDF("l", "r")
    assert(one(DataQuality.fdViolations(df, col("l"), col("r"))) == 1L)
  }

  test("orphans: null FKs are not orphans; missing parents are") {
    val child = Seq(Some(1L), Some(9L), None, Some(9L)).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    assert(one(DataQuality.orphans(child, col("fk"), parent, col("pk"))) == 2L)
  }

  test("kAnonymityViolations: groups under k flagged, boundary exact") {
    val df = (Seq.fill(5)(("x", "s")) ++ Seq.fill(4)(("y", "s")) :+ (("z", "t")))
      .toDF("q1", "q2")
    assert(one(DataQuality.kAnonymityViolations(df,
      Seq(col("q1"), col("q2")), 5)) == 2L) // y(4) and z(1); x(5) passes
  }

  test("audit stacks rules with zero-coalesced counts") {
    val clean = Seq(1L, 2L).toDF("k")
    val out = DataQuality.audit(Seq(
        "pk" -> DataQuality.pkViolations(clean, col("k")),
        "nulls" -> DataQuality.nullCount(clean, col("k"))))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("pk" -> 0L, "nulls" -> 0L))
  }
}
