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

  test("temperatureSample flattens strata toward sqrt-share and stays deterministic") {
    // head stratum 900 docs, tail 100: T=2 targets sqrt shares 3:1
    // (vs raw 9:1), so the tail's KEEP RATE must exceed the head's
    val d = (1L to 900L).map(i => ("head", i)) ++ (1001L to 1100L).map(i => ("tail", i))
    val df = d.toDF("src", "id").withColumn("key", concat(lit("k"), $"id"))
    val kept = Sampling.temperatureSample(df, $"src", $"key", budgetDocs = 400L)
    val byStratum = kept.groupBy($"src").count().as[(String, Long)].collect().toMap
    val rateHead = byStratum.getOrElse("head", 0L).toDouble / 900
    val rateTail = byStratum.getOrElse("tail", 0L).toDouble / 100
    assert(rateTail > rateHead,
      s"tail rate $rateTail must exceed head rate $rateHead under T=2")
    // overall yield lands near the budget (hash-sample variance aside)
    val total = byStratum.values.sum
    assert(total > 200 && total < 600, s"yield $total far from budget 400")
    // partition-invariant determinism, like every sampler here
    val a = kept.select($"id").as[Long].collect().toSet
    val b = Sampling.temperatureSample(df.repartition(7), $"src", $"key", 400L)
      .select($"id").as[Long].collect().toSet
    assert(a == b)
  }

  test("temperatureSample: empty input returns empty, no NPE; overflowing budget fails loudly") {
    val empty = Seq.empty[(String, Long)].toDF("src", "id")
    assert(Sampling.temperatureSample(empty, $"src", $"id".cast("string"), 100L).count() == 0)
    val df = (1L to 5L).map(i => ("s", i)).toDF("src", "id")
    intercept[IllegalArgumentException] {
      Sampling.temperatureSample(df, $"src", $"id".cast("string"),
        budgetDocs = Long.MaxValue / 10000L)
    }
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

  test("sourceReputationFlag: strictly-above-mean sources only; null source is a group") {
    // corpus mean = (10+10+4+4+8)/5 = 7.2; a:10 keep, b:4 drop,
    // null-source mean 8 keep; a source AT the mean must NOT be kept
    val d = Seq((1L, Option("a"), 10L), (2L, Option("a"), 10L),
      (3L, Option("b"), 4L), (4L, Option("b"), 4L),
      (5L, Option.empty[String], 8L)).toDF("doc_id", "source", "z")
    val got = Sampling.sourceReputationFlag(d, $"source", $"z")
      .select($"doc_id", $"src_keep").as[(Long, Boolean)].collect().toMap
    assert(got == Map(1L -> true, 2L -> true, 3L -> false, 4L -> false, 5L -> true))
    assert(got.size == 5, "every row must survive the join-back")
    // all-equal scores: no source strictly beats the mean → all false
    val eq = Seq((1L, "a", 5L), (2L, "b", 5L)).toDF("doc_id", "source", "z")
    val gotEq = Sampling.sourceReputationFlag(eq, $"source", $"z")
      .select($"src_keep").as[Boolean].collect()
    assert(gotEq.forall(_ == false))
  }

  test("histogramMatchedSample tracks the target's bucket counts") {
    // source: 1000 rows bucket A, 1000 bucket B, 50 bucket C(absent in
    // target); target: 500 A, 2000 B
    val src = ((1 to 1000).map(i => (s"sa$i", "A")) ++
      (1 to 1000).map(i => (s"sb$i", "B")) ++
      (1 to 50).map(i => (s"sc$i", "C"))).toDF("k", "b")
    val tgt = ((1 to 500).map(i => (s"ta$i", "A")) ++
      (1 to 2000).map(i => (s"tb$i", "B"))).toDF("k", "b")
    val kept = Sampling.histogramMatchedSample(src, tgt, $"b", $"k")
    val byB = kept.groupBy($"b").count().as[(String, Long)].collect().toMap
    assert(byB.getOrElse("C", 0L) == 0L, "target-absent bucket must drop")
    assert(byB("B") == 1000L, "n_T >= n_S keeps the whole bucket")
    // A: rate 5000 bp of 1000 rows — hash-binomial around 500
    assert(byB("A") > 350L && byB("A") < 650L, s"A kept ${byB("A")}")
    // deterministic and partition-invariant
    val again = Sampling.histogramMatchedSample(
      src.repartition(13), tgt, $"b", $"k")
      .select($"k").as[String].collect().toSet
    assert(again == kept.select($"k").as[String].collect().toSet)
  }

  test("epochUpsample emits floor+fractional copies, exactly and reproducibly") {
    val d = (1 to 400).map(i => (s"doc$i", if (i % 2 == 0) "hi" else "lo"))
      .toDF("k", "lang")
    val got = Sampling.epochUpsample(d, $"lang", $"k",
      Map("hi" -> 250, "lo" -> 100), defaultCenti = 0)
    val n = got.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(n("lo") == 200L, "1.0 epochs = exactly one copy each")
    // hi: 2 copies each + ~50% third copy → 400..600, hash-binomial ~500
    assert(n("hi") >= 440L && n("hi") <= 560L, s"hi emitted ${n("hi")}")
    // every row's copies are epoch-numbered 0..n-1
    val epochs = got.filter($"k" === "doc2").select($"epoch")
      .as[Long].collect().sorted.toSeq
    assert(epochs == (0L until epochs.length).toSeq)
    // fractional-only epochs downsample; epoch 0 is the only index
    val frac = Sampling.epochUpsample(d, $"lang", $"k",
      Map("hi" -> 30, "lo" -> 30), defaultCenti = 30)
    val fn = frac.count()
    assert(fn > 60 && fn < 180, s"0.3 epochs kept $fn of 400")
    assert(frac.select($"epoch").distinct().as[Long].collect().toSeq == Seq(0L))
    // the extra-copy decision is salted: not the same set hashSample keeps
    val plain = Sampling.hashSample(d, $"k", 3000).select($"k")
      .as[String].collect().toSet
    val fracSet = frac.select($"k").as[String].collect().toSet
    assert(fracSet != plain, "epoch fraction must be decorrelated from hashSample")
    intercept[IllegalArgumentException] {
      Sampling.epochUpsample(d, $"lang", $"k", Map("hi" -> 10001), 100)
    }
  }

  test("capPerGroup keeps exactly k per group by (rank asc, id asc), small groups intact") {
    val rows = (1L to 100L).map(i => (s"g${i % 3}", i)) :+ (("tiny", 999L))
    val df = rows.toDF("grp", "id")
    val kept = Sampling.capPerGroup(df, $"grp", $"id",
      Sampling.hashRank52($"id".cast("string")), k = 10)
    val byG = kept.as[(String, Long)].collect().toSeq.groupBy(_._1)
    assert(byG("g0").size == 10 && byG("g1").size == 10 && byG("g2").size == 10)
    assert(byG("tiny").map(_._2) == Seq(999L), "groups under k keep everything")
    // matches the window-sort reference (rank asc, id asc) exactly
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"grp")
      .orderBy(Sampling.hashRank52($"id".cast("string")).asc, $"id".asc)
    val ref = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"grp", $"id").as[(String, Long)].collect().toSet
    assert(kept.as[(String, Long)].collect().toSet == ref)
    // deterministic under repartitioning
    val again = Sampling.capPerGroup(df.repartition(7), $"grp", $"id",
      Sampling.hashRank52($"id".cast("string")), k = 10)
      .as[(String, Long)].collect().toSet
    assert(again == ref)
  }
}
