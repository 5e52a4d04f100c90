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
