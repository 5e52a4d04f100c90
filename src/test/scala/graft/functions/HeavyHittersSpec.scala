package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the two-pass Misra-Gries heavy hitters: output is bit-identical
  * to the full exact groupBy (the whole point — candidates are a
  * superset, recount removes false positives), including the
  * adversarial case where a heavy term is spread evenly across
  * partitions (the pigeonhole soundness argument's worst case).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(terms: Seq[String], num: Long, den: Long): Set[(String, Long)] = {
    val n = terms.size.toLong
    terms.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * den > n * num }
      .toSet
  }

  test("heavy hitters == exact groupBy on a skewed corpus") {
    // 3 heavy terms + a long tail of singletons
    val terms = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta") ++
      Seq.fill(150)("gamma") ++ (1 to 350).map(i => s"tail$i")
    val df = spark.sparkContext.parallelize(terms, 8).toDF("term")
    val got = HeavyHitters.heavyHitters(df, "term", 1, 10)
      .as[(String, Long)].collect().toSet
    assert(got == exact(terms, 1, 10))
    assert(got.map(_._1) == Set("alpha", "beta", "gamma"))
  }

  test("evenly-spread heavy term survives every-partition dilution") {
    // one term at exactly 12% spread uniformly over 10 partitions, noise
    // unique per partition — the case where no single partition makes the
    // term locally dominant
    val heavy = Seq.fill(120)("needle")
    val noise = (1 to 880).map(i => s"hay$i")
    // interleave so round-robin partitioning spreads the needle evenly
    val terms = (heavy ++ noise).zipWithIndex.sortBy(_._2 % 10).map(_._1)
    val df = spark.sparkContext.parallelize(terms, 10).toDF("term")
    val got = HeavyHitters.heavyHitters(df, "term", 1, 10)
      .as[(String, Long)].collect().toSet
    assert(got == exact(terms, 1, 10))
    assert(got.exists(_._1 == "needle"))
  }

  test("no false positives below the threshold; nulls ignored; bad fraction rejected") {
    val terms = Seq.fill(50)("a") ++ Seq.fill(50)("b")
    val df = (terms.map(Option(_)) ++ Seq.fill(10)(Option.empty[String])).toDF("term")
    // threshold 60%: nothing qualifies (each term is exactly 50% of 100 non-null)
    val got = HeavyHitters.heavyHitters(df, "term", 6, 10).collect()
    assert(got.isEmpty)
    // 40%: both qualify with exact counts
    val got2 = HeavyHitters.heavyHitters(df, "term", 4, 10)
      .as[(String, Long)].collect().toSet
    assert(got2 == Set(("a", 50L), ("b", 50L)))
    intercept[IllegalArgumentException] {
      HeavyHitters.heavyHitters(df, "term", 3, 2)
    }
  }

  test("heavyTerms over documents matches exact token counting") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("term"))
    val n = toks.count()
    val expect = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 100 > n * 1)
      .as[(String, Long)].collect().toSet
    val got = HeavyHitters.heavyTerms(docs, col("text"), 1, 100)
      .as[(String, Long)].collect().toSet
    assert(got == expect && got.nonEmpty)
  }
}
