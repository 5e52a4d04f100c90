package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------------- text

  test("sentences: splits on terminal punctuation runs, drops empties, keeps the tail") {
    val got = Seq(
      "One. Two!  Three?? Four",   // mixed terminators, multi-space
      "No terminators here",       // single sentence
      ". . leading and doubled.",  // leading/empty fragments dropped
      "").toDF("text")
      .select(TextFunctions.sentences($"text").as("s"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("One", "Two", "Three", "Four"))
    assert(got(1) == Seq("No terminators here"))
    assert(got(2) == Seq("leading and doubled."),
      "interior punctuation-only fragments drop; trailing dot stays")
    assert(got(3) == Seq.empty)
  }

  test("bigramLmScore: hand-computed corpus counts and integer-exact scaled probabilities") {
    // uni: a=3 b=3 c=1; bigrams: "a b"=3, "b a"=1
    // p("a b") = 1e6*3 div 3 = 1000000; p("b a") = 1e6*1 div 3 = 333333
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "c")).toDF("doc_id", "text")
    val got = TextFunctions.bigramLmScore(docs, $"doc_id", $"text")
      .orderBy($"doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L, 2333333L), (2L, 1L, 1000000L), (3L, 0L, 0L)))
  }

  test("bigramLmScore is partition-invariant and scores null/short docs as zero") {
    val docs = Seq((1L, "x y x y z"), (2L, null: String), (3L, "solo"))
      .toDF("doc_id", "text")
    val a = TextFunctions.bigramLmScore(docs, $"doc_id", $"text")
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    val b = TextFunctions.bigramLmScore(docs.repartition(7), $"doc_id", $"text")
      .orderBy($"doc_id").collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a(1) == Seq(2L, 0L, 0L) && a(2) == Seq(3L, 0L, 0L))
  }

  test("wsTokenCount: whitespace runs, empty and blank strings") {
    val got = Seq("a b  c", "  ", "", "one").toDF("t")
      .select(TextFunctions.wsTokenCount($"t")).as[Int].collect().toSeq
    assert(got == Seq(3, 0, 0, 1))
  }

  test("tokens splits on non-alphanumerics and lowercases") {
    val got = Seq("Hello, World! x2").toDF("t")
      .select(TextFunctions.tokens($"t")).as[Seq[String]].head()
    assert(got == Seq("hello", "world", "x2"))
  }

  test("shingles: n-grams and short-doc fallback") {
    val df = Seq("a b c d").toDF("t")
    val got = df.select(TextFunctions.shingles(TextFunctions.tokens($"t"), 3))
      .as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = df.select(TextFunctions.shingles(TextFunctions.tokens($"t"), 9))
      .as[Seq[String]].head()
    assert(short == Seq("a b c d"))
  }

  test("langId: stopword argmax + CJK gate") {
    val got = Seq(
      "the cat is on the mat and it is happy",
      "der Hund ist nicht mit der Katze und das ist gut",
      "el perro es un animal que no es el gato",
      "le chien est dans la maison et les chats",
      "这是一个中文句子没有空格",
    ).toDF("t").select(TextFunctions.langId($"t")).as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "zh"))
  }

  test("qualityScore in [0,1]; junk scores below clean prose") {
    val rows = Seq(
      "the quick brown fox jumps over the lazy dog and it is a fine day in the park with the sun",
      "!!! ### $$$ %%% ^^^ &&& *** ((( )))",
    ).toDF("t").select(TextFunctions.qualityScore($"t")).as[Double].collect()
    assert(rows.forall(s => s >= 0.0 && s <= 1.0))
    assert(rows(0) > rows(1))
  }

  test("fingerprints are stable under whitespace normalization only") {
    val df = Seq(("a b c d e f", "a  b   c d e f", "a b c d e CHANGED"))
      .toDF("x", "y", "z")
    val r = df.select(
      TextFunctions.docFingerprint($"x"), TextFunctions.docFingerprint($"y"),
      TextFunctions.docFingerprint($"z")).head()
    assert(r.getLong(0) == r.getLong(1))
    assert(r.getLong(0) != r.getLong(2))
  }

  test("minShingleFingerprint survives a far-from-minimum edit") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val df = Seq((base, base + " tail tail2")).toDF("a", "b")
    val r = df.select(TextFunctions.minShingleFingerprint($"a"),
      TextFunctions.minShingleFingerprint($"b")).head()
    // appending tokens adds shingles; min over a superset can only stay or drop
    assert(r.getLong(1) <= r.getLong(0))
  }

  // ---------------------------------------------------------- simhash

  test("SimHash64: deterministic, order-insensitive-ish, near texts near in hamming") {
    val a = "the quick brown fox jumps over the lazy dog " * 4
    val b = a.replace("lazy", "sleepy") // small edit
    val c = "completely different words entirely unrelated content here " * 4
    val df = Seq((a, a, b, c)).toDF("a1", "a2", "b", "c")
    def sh(c0: org.apache.spark.sql.Column) = SimHash64.simhash64(TextFunctions.tokens(c0))
    val r = df.select(sh($"a1"), sh($"a2"), sh($"b"), sh($"c")).head()
    val (h1, h2, hb, hc) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(h1 == h2)
    def hamming(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(hamming(h1, hb) < hamming(h1, hc))
    assert(hamming(h1, hb) <= 16)
  }

  test("SimHash64 works inside whole-stage codegen (many-row projection)") {
    val n = spark.range(1000)
      .select(concat(lit("doc text number "), $"id".cast("string")).as("t"))
      .select(SimHash64.simhash64(TextFunctions.tokens($"t")).as("h"))
      .select(countDistinct($"h")).as[Long].head()
    assert(n > 500) // distinct docs hash apart
  }

  // ------------------------------------------------------------ dedup

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  test("exactDedup keeps min id per identical text") {
    val df = docs((1L, "same text"), (2L, "same text"), (3L, "other text"))
    val got = Dedup.exactDedup(df, "text", "doc_id").select($"doc_id")
      .as[Long].collect().toSet
    assert(got == Set(1L, 3L))
  }

  test("minhash LSH finds a near-duplicate and dedup drops the higher id") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base.replace("word30", "changed")
    val far = (1 to 60).map(i => s"other$i").mkString(" ")
    val df = docs((10L, base), (20L, near), (30L, far))
    val pairs = Dedup.minhashCandidatePairs(df, "text", "doc_id")
      .as[(Long, Long, Double)].collect()
    assert(pairs.exists(p => p._1 == 10L && p._2 == 20L && p._3 > 0.7))
    assert(!pairs.exists(p => p._2 == 30L || p._1 == 30L))
    val kept = Dedup.minhashDedup(df, "text", "doc_id").select($"doc_id")
      .as[Long].collect().toSet
    assert(kept == Set(10L, 30L))
  }

  test("simhashDedup drops near text, keeps far text") {
    val base = (1 to 80).map(i => s"word$i").mkString(" ")
    val near = base.replace("word30", "changed")
    val far = (1 to 80).map(i => s"zz$i qq$i").mkString(" ")
    val kept = Dedup.simhashDedup(docs((1L, base), (2L, near), (3L, far)),
      "text", "doc_id", maxHamming = 6).select($"doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("contaminationPairs flags corpus docs overlapping the probe set, not bystanders") {
    val probe = "the quick brown fox jumps over the lazy dog in the morning light"
    val corpus = Seq(
      (1L, s"prefix words then $probe and a training suffix"), // leaked verbatim span
      (2L, "completely unrelated text about spark catalyst optimizer internals here"),
      (3L, "the quick brown cat sits under the lazy dog statue")) // < minShared 5-grams
      .toDF("doc_id", "text")
    val probes = Seq((100L, probe)).toDF("probe_id", "text")
    val got = Dedup.contaminationPairs(corpus, "doc_id", "text",
        probes, "probe_id", "text", n = 5, minShared = 3)
      .select($"doc_id", $"probe_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 100L)), s"got $got")
    // DISJOINT id namespaces: a corpus doc whose id happens to equal a
    // probe id must still be flagged (self-pair exclusion is opt-in)
    val collide = Dedup.contaminationPairs(
        corpus.withColumn("doc_id", lit(100L)).limit(1), "doc_id", "text",
        probes, "probe_id", "text", n = 5, minShared = 3)
      .select($"doc_id", $"probe_id").as[(Long, Long)].collect().toSet
    assert(collide == Set((100L, 100L)), s"id collision dropped: $collide")
  }

  test("ngramJaccardPairs reports true jaccard on candidates") {
    val base = (1 to 60).map(i => s"word$i").mkString(" ")
    val near = base + " extra"
    val got = Dedup.ngramJaccardPairs(docs((1L, base), (2L, near)), "text", "doc_id",
      threshold = 0.5).as[(Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._3 > 0.9)
  }

  // ------------------------------------------------------- similarity

  test("cosine and dot on known vectors") {
    val df = Seq((Seq(1.0, 0.0), Seq(0.0, 1.0), Seq(2.0, 0.0))).toDF("x", "y", "z")
    val r = df.select(
      Similarity.cosine($"x", $"y"), Similarity.cosine($"x", $"z"),
      Similarity.dot($"x", $"z")).head()
    assert(math.abs(r.getDouble(0)) < 1e-12)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(r.getDouble(2) == 2.0)
  }

  test("bruteForceTopK returns nearest first, deterministic ties") {
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(0.9f, 0.1f)), (3L, Seq(0.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val queries = Seq((100L, Seq(1.0f, 0.0f))).toDF("query_id", "query_vec")
    val got = Similarity.bruteForceTopK(queries, corpus, k = 2)
      .orderBy($"cos".desc).select($"neighbor_id").as[Long].collect().toSeq
    assert(got == Seq(1L, 2L))
  }

  test("annTopK candidates are exact-cosine scored and within brute-force set") {
    val corpus = (0 until 50).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 7L)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ann = Similarity.annTopK(queries, corpus, k = 5, dim = 8)
      .select($"neighbor_id", $"cos").as[(Long, Double)].collect().toMap
    val bf = Similarity.bruteForceTopK(queries, corpus, k = 50)
      .select($"neighbor_id", $"cos").as[(Long, Double)].collect().toMap
    assert(ann.nonEmpty)
    ann.foreach { case (id, cos) => assert(math.abs(bf(id) - cos) < 1e-12) }
  }

  test("cosineNearDupDedup drops a scaled copy (cosine 1.0), keeps orthogonal") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(2.0f, 4.0f, 6.0f, 8.0f)), // same direction
      (3L, Seq(-4.0f, 3.0f, -2.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val kept = Similarity.cosineNearDupDedup(df, "vec_id", "embedding", dim = 4)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L))
  }

  test("dot: mismatched-length arrays yield NULL, not a partial product") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Seq(1.0, 2.0), Seq(3.0, 4.0)),
      (Seq(1.0, 2.0, 5.0), Seq(3.0, 4.0)), // truncated/corrupt pair
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(11.0), None))
  }

  test("dot: element nulls poison the product to NULL, not a partial score") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](3.0, 4.0)), // sparse/corrupt
    ).toDF("a", "b")
    val got = df.select(Similarity.dot(col("a"), col("b")).as("d"))
      .as[Option[Double]].collect().toSeq
    assert(got == Seq(Some(11.0), None))
  }

  test("ivfTopK handles a single centroid (greatest() needs two args)") {
    val corpus = (0 until 10).map { i =>
      (i.toLong, Seq.tabulate(4)(j => math.sin(i * 4 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val got = Similarity.ivfTopK(queries, corpus, k = 3, nCentroids = 1, nProbe = 1, iters = 1)
    assert(got.count() == 3)
  }

  test("ivfTopK with nProbe = nCentroids degenerates to exact brute force") {
    val corpus = (0 until 60).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.sin(i * 8 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" <= 2L)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ivf = Similarity.ivfTopK(queries, corpus, k = 5,
        nCentroids = 4, nProbe = 4, iters = 2)
      .select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect().toSet
    val bf = Similarity.bruteForceTopK(queries, corpus, k = 5)
      .select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect().toSet
    assert(ivf == bf) // probing every list == scanning everything
  }

  test("ivfTopK probes fewer lists but returns exact scores from the probed set") {
    val corpus = (0 until 80).map { i =>
      (i.toLong, Seq.tabulate(8)(j => math.cos(i * 3 + j).toFloat))
    }.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id" === 1L)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    val ivf = Similarity.ivfTopK(queries, corpus, k = 5,
        nCentroids = 8, nProbe = 2, iters = 2)
      .select($"neighbor_id", $"cos").as[(Long, Double)].collect().toMap
    val bf = Similarity.bruteForceTopK(queries, corpus, k = 80)
      .select($"neighbor_id", $"cos").as[(Long, Double)].collect().toMap
    assert(ivf.nonEmpty)
    // every returned score is the TRUE cosine (approximation only affects
    // which candidates are seen, never their scores)
    ivf.foreach { case (id, cos) => assert(math.abs(bf(id) - cos) < 1e-12) }
  }

  test("exactNearDupPairs finds the scaled-copy pair and nothing else") {
    val df = Seq(
      (1L, Seq(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Seq(2.0f, 4.0f, 6.0f, 8.0f)),
      (3L, Seq(-4.0f, 3.0f, -2.0f, 1.0f)),
    ).toDF("vec_id", "embedding")
    val pairs = Similarity.exactNearDupPairs(df, "vec_id", "embedding", 0.95)
      .select($"idA", $"idB").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngrams: counting semantics — empty below n, size-n+1 windows, order") {
    import org.apache.spark.sql.functions.col
    val df = Seq("a b c d", "a b", "").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(TextFunctions.ngrams(col("t"), 3).as("g"))
    val got = df.as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty) // NO whole-doc fallback, unlike shingles
    assert(got(2).isEmpty)
  }

  test("dupFraction: repeated trigrams raise the fraction; empty is 0") {
    import org.apache.spark.sql.functions.col
    val df = Seq("x y z x y z x y z", "a b c d e", "ab").toDF("text")
      .select(TextFunctions.tokens(col("text")).as("t"))
      .select(TextFunctions.ngrams(col("t"), 3).as("g"))
      .select(TextFunctions.dupFraction(col("g")).as("f"))
    val got = df.as[Double].collect().toSeq
    // 9 tokens → 7 trigrams, only 3 distinct ("x y z","y z x","z x y")
    assert(math.abs(got(0) - (1.0 - 3.0 / 7.0)) < 1e-12)
    assert(got(1) == 0.0) // all distinct
    assert(got(2) == 0.0) // no trigrams
  }

  test("minhash bucket cap: same dedup survivors on a boilerplate cluster, fewer pairs") {
    import org.apache.spark.sql.functions.col
    // 30 identical docs (one duplicate cluster) + 2 distinct docs
    val docs = ((0 until 30).map(i => (i.toLong, "the same boilerplate footer text repeated on every page of the site")) ++
      Seq((100L, "a genuinely unique document about spark joins and shuffles here"),
          (101L, "another completely different text on parquet row group statistics")))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashDedup(docs, "text", "doc_id")
      .select(col("doc_id")).as[Long].collect().toSet
    val capped = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
        maxBucketSize = Some(2))
    val cappedLosers = capped.select(col("idB")).distinct().as[Long].collect().toSet
    val cappedSurvivors = docs.select(col("doc_id")).as[Long].collect().toSet -- cappedLosers
    assert(uncapped == cappedSurvivors) // cluster still collapses to doc 0
    // and the candidate volume is bounded: ≤ cap·m per bucket, not m²
    assert(capped.count() < 30L * 29 / 2)
  }

  test("MinHashSig fused kernel is bit-identical to the composed hash pipeline") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "tiny doc", // < shingleLen tokens → whole-doc hash path
      "a b c d e f g h i j k l m n o p",
      "",
    ).toDF("text")
    val th = docs.select(Dedup.tokenHashes(col("text")).as("__th"))
    val fused = th.select(MinHashSig.minhashSig(col("__th"), 64, 5).as("sig"))
      .as[Seq[Long]].collect().toSeq
    val composed = th
      .select(Dedup.rollingShingleHashes(col("__th"), 5).as("__sh"))
      .select(Dedup.minhashSignature(col("__sh"), 64).as("sig"))
      .as[Seq[Long]].collect().toSeq
    assert(fused == composed)
  }

  test("hashSplit is deterministic, total, and roughly proportioned") {
    import org.apache.spark.sql.functions.col
    val docs = (0 until 1000).map(i => s"document number $i").toDF("text")
    val counts = docs.groupBy(TextFunctions.hashSplit(col("text")).as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000L)
    assert(counts("train") > 700 && counts("train") < 900)
    // stable across evaluations (content-hash, not RNG)
    val again = docs.groupBy(TextFunctions.hashSplit(col("text")).as("s"))
      .count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("simhash60Agg is bit-identical to the simhash60 expression form") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy cat"),
      (3L, "completely different content here with many words"),
      (4L, ""), // empty → sim 0 on both paths
      (5L, null.asInstanceOf[String]), // NULL → sim 0 on both paths
      (6L, "one"),
    ).toDF("doc_id", "text")
    val viaAgg = Dedup.simhash60Agg(docs, "text", "doc_id")
      .as[(Long, Long)].collect().toMap
    val viaExpr = docs
      .select(col("doc_id"), Dedup.portableTokenHashes(col("text")).as("__th"))
      .select(col("doc_id"), Dedup.simhash60(col("__th")).as("sim"))
      .as[(Long, Long)].collect().toMap
    assert(viaAgg == viaExpr)
    assert(viaAgg(4L) == 0L && viaAgg(5L) == 0L)
    assert(viaAgg(1L) != viaAgg(3L))
  }

  test("bestPerCluster keeps the highest-score doc per transitive cluster, min-id on ties") {
    import org.apache.spark.sql.functions.col
    // chain 1~2~3 (transitive): best is 2 (score 9); pair 10~11 tie on
    // score → min id 10; 20 isolated → survives untouched
    val docs = Seq((1L, 5L), (2L, 9L), (3L, 7L), (10L, 4L), (11L, 4L), (20L, 1L))
      .toDF("doc_id", "score")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("idA", "idB")
    val kept = Dedup.bestPerCluster(docs, "doc_id", pairs, "score")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept == Set(2L, 10L, 20L))
    // contrast: the min-id survivor rule would keep 1 (score 5), not 2
  }

  test("bpeTokens: GPT-2-style pre-tokens, matches tile the whole string") {
    import org.apache.spark.sql.functions.{col, concat_ws}
    val df = Seq("It's 42 degrees—isn't it? Ja, schön!").toDF("text")
    val toks = df.select(TextFunctions.bpeTokens(col("text")).as("t"))
      .as[Seq[String]].head()
    assert(toks == Seq("It", "'s", " 42", " degrees", "—", "isn", "'t",
      " it", "?", " Ja", ",", " schön", "!"))
    // the pattern is total: concatenated matches reconstruct the input
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val broken = docs.select(col("text"),
        concat_ws("", TextFunctions.bpeTokens(col("text"))).as("rebuilt"))
      .filter(col("text").isNotNull && col("text") =!= col("rebuilt")).count()
    assert(broken == 0, "BPE pre-tokens must tile the input exactly")
  }

  test("editDistancePairs verifies exactly the candidate pairs, prefix-capped") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fax"),  // dist 1 from doc 1
      (3L, "completely different"),
      (4L, "Y" * 300 + "tail-a"),   // differs from 5 only past prefix 256
      (5L, "Y" * 300 + "tail-b"))
      .toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L), (4L, 5L)).toDF("idA", "idB")
    val got = Dedup.editDistancePairs(docs, cands, "text", "doc_id", maxDist = 5)
      .select(col("idA"), col("idB"), col("edit_dist"))
      .as[(Long, Long, Int)].collect().map(t => (t._1, t._2) -> t._3).toMap
    assert(got((1L, 2L)) == 1)
    assert(!got.contains((1L, 3L)), "far pair must fail verification")
    assert(got((4L, 5L)) == 0, "differences past the prefix cap are invisible")
    // non-candidate near-identical pair (2,1 reversed / others) never appears:
    // the kernel verifies candidates only, it does not generate pairs
    assert(got.size == 2)
  }

  test("signedProjection: basis vectors read out the sign matrix; map is linear") {
    import org.apache.spark.sql.functions.col
    val d = 8; val k = 4
    val signs = Similarity.projectionSigns(d, k, "rp")
    assert(signs.flatten.forall(s => s == 1.0 || s == -1.0))
    assert(signs.flatten.toSet.size == 2, "seeded matrix must contain both signs")
    // rows: basis vectors e_0..e_{d-1}, plus 2*e_0 + 3*e_1
    val basis = (0 until d).map(i =>
      (i.toLong, Array.tabulate(d)(x => if (x == i) 1.0 else 0.0).toSeq))
    val combo = Seq((99L, Array.tabulate(d)(x =>
      if (x == 0) 2.0 else if (x == 1) 3.0 else 0.0).toSeq))
    val df = (basis ++ combo).toDF("id", "v")
      .select(col("id"), col("v").cast("array<double>").as("v"))
    val got = df.select(col("id"),
        Similarity.signedProjection(col("v"), d, k, "rp").as("p"))
      .as[(Long, Seq[Double])].collect().toMap
    for (i <- 0 until d; j <- 0 until k)
      assert(got(i.toLong)(j) == signs(j)(i), s"e_$i out_$j")
    for (j <- 0 until k)
      assert(got(99L)(j) == 2.0 * signs(j)(0) + 3.0 * signs(j)(1), s"linearity out_$j")
  }

  test("linearQuality: integer features and decision match hand computation") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the cat and the dog have fun with that ball"), // stopword-rich
      (2L, "zz zz zz zz zz zz zz zz"),                     // repetitive, no stopwords
      (3L, "")).toDF("doc_id", "text")
    val got = docs.select(col("doc_id"),
        TextFunctions.linearQuality(col("text")).as("q"))
      .select(col("doc_id"), col("q.wc"), col("q.mwl_centi"), col("q.stop_d"),
        col("q.dup3_bp"), col("q.z"), col("q.keep"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 10 words, 34 chars → mwl 340, stops {the,and,have,with,that}=5,
    // 8 distinct trigrams of 8 → dup3 0; z = -600+300+2000-680-0 = 1020
    assert(got(1L) == ((1L, 10L, 340L, 5L, 0L, 1020L, true)))
    // doc 2: 8 words, 16 chars → mwl 200, 0 stops, trigrams 6 all equal →
    // dup 5/6 → 8333 bp; z = -600+240+0-400-8333 = -9093
    assert(got(2L) == ((2L, 8L, 200L, 0L, 8333L, -9093L, false)))
    // empty doc: all-zero features; z = bias = -600
    assert(got(3L) == ((3L, 0L, 0L, 0L, 0L, -600L, false)))
  }

  test("withLinearQuality: staged form is row-identical to the Column form") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the cat and the dog have fun with that ball"),
      (2L, "zz zz zz zz zz zz zz zz"),
      (3L, ""),
      (4L, "one two three four five six seven eight nine ten and so on")
    ).toDF("doc_id", "text")
    val direct = docs.select(col("doc_id"),
        TextFunctions.linearQuality(col("text")).as("q"))
      .select(col("doc_id"), col("q.wc"), col("q.mwl_centi"), col("q.stop_d"),
        col("q.dup3_bp"), col("q.z"), col("q.keep"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    val staged = TextFunctions.withLinearQuality(docs, col("text"), "q")
      .select(col("doc_id"), col("q.wc"), col("q.mwl_centi"), col("q.stop_d"),
        col("q.dup3_bp"), col("q.z"), col("q.keep"))
      .as[(Long, Long, Long, Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(direct.toSeq == staged.toSeq)
    // and the staging must not leak its scratch columns
    val cols = TextFunctions.withLinearQuality(docs, col("text"), "q").columns.toSeq
    assert(cols == Seq("doc_id", "text", "q"))
  }
}
