package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Order-independence, sensitivity, and exactness of the table checksum. */
class ChecksumSpec extends SparkSpec {
  import spark.implicits._

  private def sums(df: org.apache.spark.sql.DataFrame) =
    Checksum.grouped(df, col("g"), concat_ws("|", col("k"), col("v")))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap

  test("checksum is invariant under row order and partitioning") {
    val rows = (1 to 500).map(i => ("g" + (i % 3), i.toLong, "v" + i))
    val a = sums(rows.toDF("g", "k", "v").repartition(7))
    val b = sums(scala.util.Random.shuffle(rows).toDF("g", "k", "v").repartition(2))
    assert(a == b)
    assert(a.keySet == Set("g0", "g1", "g2"))
  }

  test("a single changed value changes exactly that group's sums") {
    val rows = (1 to 100).map(i => ("g" + (i % 2), i.toLong, "v" + i))
    val base = sums(rows.toDF("g", "k", "v"))
    val mut = sums(rows.map { case (g, k, v) =>
      if (k == 50L) (g, k, "CHANGED") else (g, k, v) }.toDF("g", "k", "v"))
    assert(base("g1") == mut("g1"))         // untouched group identical
    assert(base("g0") != mut("g0"))         // 50 % 2 == 0
    assert(base("g0")._1 == mut("g0")._1)   // n_rows unchanged
  }

  test("swapping values BETWEEN rows of a group is invisible (multiset semantics)") {
    // the checksum certifies content as a multiset; row identity is the
    // caller's job via the repr (here k is inside the repr, so a swap of
    // (k,v) pairings IS a content change — but swapping whole rows is not)
    val a = sums(Seq(("g", 1L, "x"), ("g", 2L, "y")).toDF("g", "k", "v"))
    val b = sums(Seq(("g", 2L, "y"), ("g", 1L, "x")).toDF("g", "k", "v"))
    assert(a == b)
  }

  test("halves stay exact: digests split at 30 bits, sums reconstruct") {
    val df = (1 to 1000).map(i => ("g", i.toLong, "v")).toDF("g", "k", "v")
    val h = df.select(Checksum.rowDigest(concat_ws("|", col("k"), col("v"))).as("h"))
      .collect().map(_.getLong(0))
    assert(h.forall(x => x >= 0 && x < (1L << 60)))
    val expected = (h.map(_ % (1L << 30)).sum, h.map(_ >> 30).sum)
    val got = sums(df)("g")
    assert((got._2, got._3) == expected)
  }
}
