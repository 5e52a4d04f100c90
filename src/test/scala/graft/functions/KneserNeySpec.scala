package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KneserNeySpec extends SparkSpec {
  import spark.implicits._

  // "a b" ×3, "a c" ×1, "b a" ×2, "c a" ×1 as a token stream:
  // docs chosen so bigram counts are hand-checkable
  private def corpus = Seq(
    "a b a b a b",   // a b ×3, b a ×2
    "a c a",         // a c ×1, c a ×1
  ).toDF("text")

  test("bigram counts and continuation counts are exact") {
    val t = KneserNey.bigramProbs(corpus, col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // c12
    assert(t(("a", "b"))._1 === 3L)
    assert(t(("b", "a"))._1 === 2L)
    assert(t(("a", "c"))._1 === 1L)
    assert(t(("c", "a"))._1 === 1L)
    // c1: bigram tokens with left word a = 4 (3×"a b" + 1×"a c")
    assert(t(("a", "b"))._2 === 4L)
    assert(t(("b", "a"))._2 === 2L)
    // N1+(a·) = 2 distinct continuations of a; N1+(·a) = 2 left contexts
    assert(t(("a", "b"))._3 === 2L)
    assert(t(("b", "a"))._4 === 2L)
  }

  test("kn_e9 equals the hand-computed interpolated KN rational") {
    val t = KneserNey.bigramProbs(corpus, col("text"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(6)).toMap
    // B = 4 bigram types, D = 3/4
    // p(b|a) = (3 - .75)/4 + (.75·2/4)·(N1+(·b)/4) = (4·3−3)·4 + 3·2·1 over 4·4·4
    //        = (36 + 6)/64
    assert(t(("a", "b")) === 1000000000L * 42 / 64)
    // p(a|b): c12=2, c1=2, N1+(b·)=1, N1+(·a)=2
    //        = ((8−3)·4 + 3·1·2) / (4·2·4) = 26/32
    assert(t(("b", "a")) === 1000000000L * 26 / 32)
  }

  test("probabilities over a shared left context sum below 1 (mass reserved)") {
    val rows = KneserNey.bigramProbs(corpus, col("text"))
      .filter(col("w1") === "a").collect()
    val total = rows.map(_.getLong(6)).sum
    assert(total > 0L && total <= 1000000000L)
  }
}
