package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SafetySpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "clean words only here"),
    (2L, "one SLOW path"),            // warn (case-folded)
    (3L, "dup dup slow"),             // 2 block hits + 1 warn
    (4L, "")                          // empty doc
  ).toDF("doc_id", "text")

  private val bl = Map("perf" -> Seq("slow"), "unsafe" -> Seq("dup", "DANGER"))

  test("categorized counts and keep decision") {
    val got = Safety.blocklistFlags(docs, col("doc_id"), col("text"),
        bl, blockCategories = Set("unsafe"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(got == Map(
      1L -> ((0L, 0L, true)),
      2L -> ((1L, 0L, true)),
      3L -> ((1L, 2L, false)),
      4L -> ((0L, 0L, true))))
  }

  test("blocklist terms are case-folded too") {
    val d = Seq((9L, "danger here")).toDF("doc_id", "text")
    val got = Safety.blocklistFlags(d, col("doc_id"), col("text"),
        bl, Set("unsafe")).collect().head
    assert((got.getLong(2), got.getBoolean(3)) == ((1L, false)))
  }

  test("misconfigured categories fail loudly; empty blocklist rejected") {
    intercept[IllegalArgumentException] {
      Safety.blocklistFlags(docs, col("doc_id"), col("text"), bl, Set("nope"))
    }
    intercept[IllegalArgumentException] {
      Safety.blocklistFlags(docs, col("doc_id"), col("text"), Map.empty, Set.empty)
    }
  }
}
