package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.sources.Tables.load(spark, SfDir, "documents")

  test("hashSample is deterministic, partition-invariant, and ~rate sized") {
    val a = Sampling.hashSample(docs, $"text", 5000).select($"doc_id").as[Long].collect().toSet
    val b = Sampling.hashSample(docs.repartition(7), $"text", 5000)
      .select($"doc_id").as[Long].collect().toSet
    assert(a == b, "sample must not depend on partitioning")
    val n = docs.count().toDouble
    assert(math.abs(a.size / n - 0.5) < 0.1, s"${a.size}/$n far from 50%")
  }

  test("rate 0 keeps nothing; rate 10000 keeps everything; samples nest") {
    assert(Sampling.hashSample(docs, $"text", 0).count() == 0)
    assert(Sampling.hashSample(docs, $"text", 10000).count() == docs.count())
    // a 25% sample is a strict subset of the 50% sample (same hash order)
    val s25 = Sampling.hashSample(docs, $"text", 2500).select($"doc_id").as[Long].collect().toSet
    val s50 = Sampling.hashSample(docs, $"text", 5000).select($"doc_id").as[Long].collect().toSet
    assert(s25.subsetOf(s50))
  }

  test("stratifiedSample applies per-stratum rates with a default") {
    val out = Sampling.stratifiedSample(docs, $"lang", $"text",
      Map("en" -> 10000, "de" -> 0), defaultBp = 10000)
    val langs = out.select($"lang").distinct().as[String].collect().toSet
    assert(!langs.contains("de"), "de rate 0 must drop the stratum")
    assert(out.filter($"lang" === "en").count() == docs.filter($"lang" === "en").count())
  }

  test("tokenBudget keeps the largest docs per stratum within budget, deterministically") {
    val d = Seq(
      ("en", 1L, 100L), ("en", 2L, 80L), ("en", 3L, 80L), ("en", 4L, 50L),
      ("de", 5L, 300L), ("de", 6L, 10L))
      .toDF("lang", "doc_id", "n_tok")
    val kept = Sampling.tokenBudget(d, $"lang", $"n_tok", $"doc_id", budget = 260L)
      .select($"doc_id").as[Long].collect().toSet
    // en: 100 + 80 (id 2 wins the tie) + 80 = 260 ✓, id 4 would exceed
    // de: 300 > 260 → nothing fits; greedy-by-size admits NOTHING for de
    assert(kept == Set(1L, 2L, 3L))
  }
}
