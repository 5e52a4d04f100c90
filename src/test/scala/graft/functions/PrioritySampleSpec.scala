package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Priority sampling: DLT invariants under the integer quantization. */
class PrioritySampleSpec extends SparkSpec {
  import spark.implicits._

  test("population <= k: everything kept, tau = 0, estimates exact") {
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "w")
    val out = Sampling.prioritySample(df, col("id"), col("w"), k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(out.length == 3)
    // tau = 0 -> w_est_sc = w * 1e12 exactly: subset-sum estimator is exact
    assert(out.toSeq == Seq((1L, 10L, 10L * 1000000000000L),
      (2L, 20L, 20L * 1000000000000L), (3L, 30L, 30L * 1000000000000L)))
  }

  test("selection matches the row_number reference; estimates tau-capped") {
    val df = (1L to 200L).map(i => (i, 1L + i % 97)).toDF("id", "w")
    val k = 10
    val ref = df.select(col("id"), col("w"),
        expr("w * 1000000000000L div (conv(substring(md5(cast(id as string)),1,13),16,10) + 1)").as("p"))
      .orderBy(col("p").desc, col("id").asc).collect()
    val tau = ref(k).getLong(2)
    val expect = ref.take(k).map(r =>
      (r.getLong(0), r.getLong(1), math.max(r.getLong(1) * 1000000000000L, tau))).toSet
    val got = Sampling.prioritySample(df, col("id"), col("w"), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expect)
  }

  test("estimator is weight-sensitive: an overwhelming weight is always kept") {
    val df = ((1L to 100L).map(i => (i, 1L)) :+ (999L, 9000L)).toDF("id", "w")
    val kept = Sampling.prioritySample(df, col("id"), col("w"), k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(999L))
  }

  test("weights past double-exactness fail loudly") {
    val df = Seq((1L, 9008L)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.prioritySample(df, col("id"), col("w"), k = 1).collect()
    }
    assert(e.getMessage != null)
  }

  test("deterministic across partitionings") {
    val df = (1L to 500L).map(i => (i, 1L + i % 40)).toDF("id", "w")
    val a = Sampling.prioritySample(df.repartition(13), col("id"), col("w"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    val b = Sampling.prioritySample(df.repartition(2), col("id"), col("w"), 20)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toSet
    assert(a == b)
  }
}
