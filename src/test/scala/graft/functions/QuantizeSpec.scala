package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QuantizeSpec extends SparkSpec {
  import spark.implicits._

  test("int8: max element hits ±127, zeros stay zero, codes clamp to range") {
    val d = Seq(
      (1L, Seq(1.0f, -2.0f, 0.0f, 0.5f)),
      (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(-3.0f)))
      .toDF("vec_id", "embedding")
    val got = d.select($"vec_id", Quantize.int8($"embedding").as("q"))
      .as[(Long, Seq[Long])].collect().toMap
    // vmax=2: 1.0→floor(63.5+0.5)=64, -2→-127 (floor(-127+0.5)=-127), 0.5→32
    assert(got(1L) == Seq(64L, -127L, 0L, 32L))
    assert(got(2L) == Seq(0L, 0L), "all-zero vector quantizes to zeros")
    assert(got(3L) == Seq(-127L))
    val bad = d.select(explode(Quantize.int8($"embedding")).as("q"))
      .filter($"q" > 127 || $"q" < -127).count()
    assert(bad == 0)
  }

  test("signBits packs MSB-first per 32-bit block") {
    // dims 0 and 33 positive (1-based: elements 1 and 34) →
    // block0 bit 31 (value 2^31), block1 bit 30 (value 2^30)
    val v = Array.fill(64)(-1.0f)
    v(0) = 2.5f; v(33) = 0.1f
    val got = Seq((1L, v.toSeq)).toDF("vec_id", "embedding")
      .select(Quantize.signBits($"embedding", dim = 64).as("sig"))
      .as[Seq[Long]].head()
    assert(got == Seq(1L << 31, 1L << 30))
    // all-positive packs to 2^32-1 per block; all-negative to zero
    val allPos = Seq((1L, Seq.fill(64)(1.0f))).toDF("vec_id", "embedding")
      .select(Quantize.signBits($"embedding", dim = 64).as("sig"))
      .as[Seq[Long]].head()
    assert(allPos == Seq((1L << 32) - 1, (1L << 32) - 1))
    // zero is NOT positive: sign bit 0 (matches the oracle's x > 0)
    val zeros = Seq((1L, Seq.fill(64)(0.0f))).toDF("vec_id", "embedding")
      .select(Quantize.signBits($"embedding", dim = 64).as("sig"))
      .as[Seq[Long]].head()
    assert(zeros == Seq(0L, 0L))
  }

  test("hammingTopK: smallest distance first, ties break to lowest id") {
    def vec(bits: Int*): Seq[Float] =
      (0 until 64).map(i => if (bits.contains(i)) 1.0f else -1.0f)
    val corpus = Seq(
      (0L, vec(0, 1, 2)),       // the query
      (1L, vec(0, 1, 2, 3)),    // hamming 1
      (2L, vec(0, 1)),          // hamming 1 (tie → after id 1)
      (3L, vec(40, 41, 42)))    // hamming 6
      .toDF("vec_id", "embedding")
    val sigs = corpus.select($"vec_id",
      Quantize.signBits($"embedding", dim = 64).as("sig"))
    val queries = sigs.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"sig".as("query_sig"))
    val got = Similarity.hammingTopK(queries, sigs, k = 3, nBlocks = 2)
      .orderBy($"rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((0L, 1L, 1L, 1L), (0L, 2L, 2L, 1L), (0L, 3L, 3L, 6L)))
  }

  test("hardNegatives excludes same-label vectors and ranks by cosine") {
    val rows = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 7),   // query, label 7
      (1L, Seq(1.0f, 0.1f, 0.0f), 7),   // same label: excluded despite cos≈1
      (2L, Seq(1.0f, 0.5f, 0.0f), 3),   // diff label, cos ≈ 0.894
      (3L, Seq(0.0f, 1.0f, 0.0f), 3),   // diff label, cos 0
      (4L, Seq(1.0f, 0.4f, 0.0f), 5))   // diff label, cos ≈ 0.928 (closest)
      .toDF("vec_id", "embedding", "label")
    val queries = rows.filter($"vec_id" === 0L)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"),
        $"label".as("query_label"))
    val got = Similarity.hardNegatives(queries, rows, k = 2)
      .orderBy($"rank")
      .select($"neg_id", $"rank").as[(Long, Long)].collect().toSeq
    assert(got == Seq((4L, 1L), (2L, 2L)),
      "same-label near-duplicate must not appear as a negative")
  }

  test("int8 reconstruction error is bounded by half a step") {
    val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")
    val err = emb.select(
      Quantize.int8($"embedding").as("q"),
      Quantize.int8Scale($"embedding").as("s"),
      transform($"embedding", _.cast("double")).as("v"))
      .select(explode(zip_with($"q", $"v", (q, v) => abs(q * $"s" - v))).as("e"),
        $"s")
      .agg(max($"e" / $"s").as("worst_steps")).as[Double].head()
    assert(err <= 0.5 + 1e-9, s"worst reconstruction error $err steps")
  }
}
