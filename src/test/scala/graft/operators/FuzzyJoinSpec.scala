package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Deletion-neighborhood linkage: key completeness for every 1-edit
  * class, the no-match case, and the argmin tie rule.
  */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private val catalog = Seq(
    (1L, "spark"), (2L, "sparks"), (3L, "shark"), (4L, "zzzz")
  ).toDF("cid", "cname")

  private def best(probes: (Long, String)*): Map[Long, (Long, Long)] =
    FuzzyJoin.bestMatch1(probes.toDF("pid", "pname"), col("pid"), col("pname"),
        catalog, col("cid"), col("cname"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("deletionKeys: the string itself plus every single deletion") {
    val ks = Seq("abc").toDF("s").select(FuzzyJoin.deletionKeys(col("s")))
      .head().getSeq[String](0).toSet
    assert(ks == Set("abc", "bc", "ac", "ab"))
  }

  test("finds deletion, insertion and substitution matches (dist 1) and exact (dist 0)") {
    val m = best(
      (10L, "spark"),   // exact -> (1, 0)
      (11L, "sprk"),    // deletion of 'a' -> spark dist 1
      (12L, "sparkk"),  // insertion -> spark? dist 1 (also sparks dist 1: tie -> cid 1)
      (13L, "spafk"))   // substitution -> spark dist 1
    assert(m(10L) == ((1L, 0L)))
    assert(m(11L) == ((1L, 1L)))
    assert(m(12L) == ((1L, 1L)))  // tie between spark(1) and sparks(2) -> lowest id
    assert(m(13L) == ((1L, 1L)))
  }

  test("probe with no catalog entry within 1 edit is absent") {
    val m = best((20L, "sparkzzz"), (21L, "quartz"))
    assert(m.isEmpty)
  }

  test("dist-0 beats dist-1 regardless of candidate id order") {
    // "sparks" is exact for cid 2 even though cid 1 is one edit away
    val m = best((30L, "sparks"))
    assert(m(30L) == ((2L, 0L)))
  }
}
