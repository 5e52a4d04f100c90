package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the codegen [[EqCount]] kernel to the interpreted composition
  * it replaced (`size(filter(zip_with(a, b, _ === _), x => x))`) —
  * values AND the null/length contract — so the swap can never drift
  * (the IntSqDistSpec discipline).
  */
class EqCountSpec extends SparkSpec {
  import spark.implicits._

  private def composition(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    size(filter(zip_with(a, b, (x, y) => x === y), x => x)).cast("long")

  test("kernel equals the zip_with/filter composition on random signatures") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { i =>
      val n = rnd.nextInt(8) + 1
      val a = Seq.fill(n)(rnd.nextInt(4).toLong)
      val b = Seq.fill(n)(rnd.nextInt(4).toLong)
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
    val diff = df.select(
        EqCount.eqCount($"a", $"b").as("k"),
        composition($"a", $"b").as("c"))
      .filter($"k" =!= $"c")
    assert(diff.count() == 0)
  }

  test("length overhang and null elements count as disagreement, never poison") {
    val df = Seq(
      (1L, Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 2L)),
      (2L, Seq[java.lang.Long](1L, null, 3L), Seq[java.lang.Long](1L, null, 3L)),
      (3L, Seq[java.lang.Long](), Seq[java.lang.Long](5L))
    ).toDF("id", "a", "b")
    val got = df.select($"id", EqCount.eqCount($"a", $"b").as("k"),
        composition($"a", $"b").as("c"))
      .orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L), (2L, 2L, 2L), (3L, 0L, 0L)))
  }

  test("estJaccard through the kernel matches on the corpus signatures (join-shaped)") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val pairs = Dedup.minhashCandidatePairs(docs, "text", "doc_id")
      .select($"idA", $"idB", $"est_jaccard")
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b, j) =>
      assert(a < b && j >= 0.5 && j <= 1.0) }
    // the composition spelled out inline over the same signatures and
    // the SAME (estimator-independent) band-candidate set must produce
    // the identical verified pair set — a kernel divergence on the real
    // join path fails here, not only at the q23 oracle. threshold = 0
    // keeps every band candidate (any estimate passes >= 0), so the
    // candidate generation itself never consults the kernel's value.
    val candidates = Dedup.minhashCandidatePairs(docs, "text", "doc_id",
        threshold = 0.0)
      .select($"idA", $"idB")
    val sigs = Dedup.signatures(docs, "text", "doc_id", k = 64, shingleLen = 5)
    val composed = candidates
      .join(sigs.select($"id".as("idA"), $"sig".as("sigA")), Seq("idA"))
      .join(sigs.select($"id".as("idB"), $"sig".as("sigB")), Seq("idB"))
      .select($"idA", $"idB",
        (composition($"sigA", $"sigB").cast("double") / lit(64)).as("est_jaccard"))
      .filter($"est_jaccard" >= 0.5)
      .as[(Long, Long, Double)].collect().toSet
    assert(composed == pairs)
  }
}
