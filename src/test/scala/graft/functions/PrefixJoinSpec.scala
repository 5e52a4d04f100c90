package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PrefixJoinSpec extends SparkSpec {
  import spark.implicits._

  private def bruteForce(df: org.apache.spark.sql.DataFrame, t: Double) = {
    val sets = df.select(col("doc_id").cast("long").as("id"),
        array_distinct(TextFunctions.tokens(col("text"))).as("toks"))
      .filter(size(col("toks")) > 0)
    val a = sets.select(col("id").as("idA"), col("toks").as("ta"))
    val b = sets.select(col("id").as("idB"), col("toks").as("tb"))
    a.crossJoin(b).filter(col("idA") < col("idB"))
      .withColumn("__i", size(array_intersect(col("ta"), col("tb"))))
      .withColumn("__u", size(col("ta")) + size(col("tb")) - col("__i"))
      .filter(col("__i").cast("double") / col("__u").cast("double") >= t)
      .select(col("idA"), col("idB"),
        (col("__i").cast("double") / col("__u").cast("double")).as("jaccard"))
  }

  test("finds exactly the qualifying pairs on a crafted corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),       // J(1,2) = 4/6 = 0.667
      (3L, "alpha beta gamma delta epsilon"),    // J(1,3) = 1.0
      (4L, "one two three four five six"),
      (5L, "totally different words here now"),
      (6L, "one two three four five seven")      // J(4,6) = 5/7 ≈ 0.714
    ).toDF("doc_id", "text")
    val got = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 0.6)
      .orderBy("idA", "idB").collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 6L)))
    val j12 = got.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get.getDouble(2)
    assert(math.abs(j12 - 4.0 / 6.0) < 1e-12)
  }

  test("prefix filter is complete: matches brute force on real documents") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    for (t <- Seq(0.5, 0.8)) {
      val fast = PrefixJoin.jaccardJoin(docs, "doc_id", "text", t)
        .select("idA", "idB").as[(Long, Long)].collect().toSet
      val slow = bruteForce(docs, t)
        .select("idA", "idB").as[(Long, Long)].collect().toSet
      assert(fast === slow, s"prefix join diverged from brute force at t=$t")
    }
  }

  test("shingle variant is complete vs brute force on real documents") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val sets = docs.select(col("doc_id").cast("long").as("id"),
      array_distinct(TextFunctions.shingles(
        TextFunctions.tokens(col("text")), 3)).as("sh"))
    val a = sets.select(col("id").as("idA"), col("sh").as("ta"))
    val b = sets.select(col("id").as("idB"), col("sh").as("tb"))
    val slow = a.crossJoin(b).filter(col("idA") < col("idB"))
      .withColumn("__i", size(array_intersect(col("ta"), col("tb"))))
      .filter(col("__i") * 10000L >=
        (size(col("ta")) + size(col("tb")) - col("__i")) * 6000L)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val fast = PrefixJoin.shingleJaccardJoin(docs, "doc_id", "text", 3, 0.6)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(fast === slow)
    // the hashed production shapes find the identical pair set (60/64-bit
    // conflation is deterministic and collision-free at corpus scale)
    val hashed = PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(hashed === slow)
    val xxfast = PrefixJoin.shingleFastJaccardJoin(docs, "doc_id", "text", 3, 0.6)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    assert(xxfast === slow)
  }

  test("completeness holds on adversarial random set families (property sweep)") {
    // random universes with the degenerate shapes a crafted fixture
    // misses: singletons, identical sets, near-threshold pairs, skewed
    // element frequencies — prefix join (BOTH orders) vs exact brute
    // force over the same hashed sets. Deterministic seed: failures
    // reproduce.
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 4; t <- Seq(0.5, 0.8, 1.0)) {
      val uni = 1 + rnd.nextInt(30) // small universe → forced collisions
      val sets = (1L to 40L).map { id =>
        val sz = 1 + rnd.nextInt(12)
        (id, Seq.fill(sz)(rnd.nextInt(uni).toLong + 1000L).distinct)
      } ++ Seq((98L, Seq(2000L)), (99L, Seq(2000L))) // identical singletons
      val df = sets.toDF("id", "els")
      def pairs(dfOrder: Boolean) =
        PrefixJoin.jaccardJoinSets(df, "id", "els", t, dfOrder)
          .select("idA", "idB").as[(Long, Long)].collect().toSet
      val byId = sets.toMap
      val slow = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        i = sa.toSet.intersect(sb.toSet).size
        if i * 10000L >= math.round(t * 10000) * (sa.toSet.size + sb.toSet.size - i).toLong
      } yield (a, b)).toSet
      assert(pairs(dfOrder = false) === slow,
        s"value-order incomplete at t=$t trial=$trial uni=$uni")
      assert(pairs(dfOrder = true) === slow,
        s"df-order incomplete at t=$t trial=$trial uni=$uni")
      assert(byId.nonEmpty)
    }
  }

  test("dfOrder=true returns the identical pair set and jaccard values") {
    // the completeness lemma holds for ANY agreed element order; the
    // rarest-first (document-frequency) order must change only candidate
    // volume, never the result
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val value = PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6)
      .select("idA", "idB", "jaccard").as[(Long, Long, Double)].collect().toSet
    val dford = PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6,
        dfOrder = true)
      .select("idA", "idB", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(dford === value)
    assert(value.nonEmpty, "fixture must exercise the operator")
  }

  test("threshold 1.0 degenerates to exact-set equality, prefix length 1") {
    val docs = Seq(
      (1L, "a b c"), (2L, "c b a"), (3L, "a b")
    ).toDF("doc_id", "text")
    val got = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 1.0).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((1L, 2L)))
    assert(got.head.getDouble(2) === 1.0)
  }

  test("candidate stage plans as an equi-join on the prefix token, never a cross product") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val plan = PrefixJoin.jaccardJoin(docs, "doc_id", "text", 0.6)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "prefix candidate join degenerated to a cross product")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "prefix candidate join degenerated to a nested-loop join")
  }

  test("jaccardDedup drops exactly the higher-id members of pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta zeta"),
      (5L, "totally different words here now")
    ).toDF("doc_id", "text")
    val kept = PrefixJoin.jaccardDedup(docs, "doc_id", "text", 0.6)
      .select("doc_id").as[Long].collect().sorted
    assert(kept === Array(1L, 5L))
  }
}
