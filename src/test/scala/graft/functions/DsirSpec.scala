package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // target docs: "alpha beta" world
    (1L, "alpha beta alpha beta gamma", true),
    (2L, "alpha beta delta alpha beta", true),
    // raw doc that looks like the target
    (3L, "alpha beta alpha beta alpha beta", false),
    // raw doc that looks nothing like it
    (4L, "omega psi chi omega psi chi", false),
    // raw doc halfway — SAME bigram count as doc 4: the score is a sum
    // over feature instances, so cross-length comparisons mix in length
    (5L, "alpha beta alpha omega psi chi", false),
  ).toDF("doc_id", "text", "is_tgt")

  test("target-like docs outscore off-target docs; targets rank high") {
    val scores = Dsir.importanceScores(corpus, col("doc_id"), col("text"),
      col("is_tgt"), m = 64)
    val byId = scores.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // the target-mimicking raw doc beats the off-target one
    assert(byId(3L) > byId(4L))
    // the halfway doc lands between them
    assert(byId(5L) > byId(4L) && byId(5L) < byId(3L))
    // self-check: target docs themselves score high (> the off-target raw)
    assert(byId(1L) > byId(4L) && byId(2L) > byId(4L))
  }

  test("selectTopK is a deterministic cut with ranks 1..k") {
    val scores = Dsir.importanceScores(corpus, col("doc_id"), col("text"),
      col("is_tgt"), m = 64)
    val top3 = Dsir.selectTopK(scores, 3).collect()
    assert(top3.length === 3)
    assert(top3.map(_.getInt(2)).toSeq === Seq(1, 2, 3))
    // ranks follow (score desc, id asc)
    val pairs = top3.map(r => (r.getLong(1), r.getLong(0))).toSeq
    assert(pairs === pairs.sortBy { case (s, id) => (-s, id) })
  }

  test("score is scale-equivariant in the ratio scale") {
    val s1 = Dsir.importanceScores(corpus, col("doc_id"), col("text"),
      col("is_tgt"), m = 64, scale = 1000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s10 = Dsir.importanceScores(corpus, col("doc_id"), col("text"),
      col("is_tgt"), m = 64, scale = 10000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 10x the fixed-point scale ≈ 10x the score (within div truncation:
    // each of ≤64 buckets truncates < 1 unit, amplified by cnt ≤ 6)
    s1.keySet.foreach { id =>
      assert(math.abs(s10(id) - 10 * s1(id)) <= 64 * 10)
    }
  }
}
