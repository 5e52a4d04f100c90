package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Asymmetric containment join: direction, boundary, completeness. */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def join(t: Double, rows: (Long, Seq[Long])*) =
    PrefixJoin.containmentJoinSets(rows.toDF("id", "els"), "id", "els", t)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap

  test("subset is fully contained one way, not the other") {
    val m = join(0.8, (1L, Seq(1L, 2L, 3L, 4L)), (2L, (1L to 8L)))
    assert(m == Map((1L, 2L) -> 10000L)) // 4/4 forward; 4/8 backward absent
  }

  test("threshold boundary: exactly t qualifies, below does not") {
    // A = {1,2,3,10}: 3 of 4 in B -> 7500
    val at = join(0.75, (1L, Seq(1L, 2L, 3L, 10L)), (2L, (1L to 8L)))
    assert(at.get((1L, 2L)).contains(7500L))
    val above = join(0.8, (1L, Seq(1L, 2L, 3L, 10L)), (2L, (1L to 8L)))
    assert(!above.contains((1L, 2L)))
  }

  test("identical sets contain each other (both directions emitted)") {
    val m = join(1.0, (1L, Seq(5L, 6L, 7L)), (2L, Seq(5L, 6L, 7L)))
    assert(m == Map((1L, 2L) -> 10000L, (2L, 1L) -> 10000L))
  }

  test("prefix filter is complete: matches brute force on real documents") {
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val got = PrefixJoin.shingleHashContainmentJoin(docs, "doc_id", "text",
        n = 3, threshold = 0.8)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    // naive all-pairs reference over the same hashed shingle sets
    val sets = docs.select(col("doc_id"), transform(
        TextFunctions.shingles(TextFunctions.tokens(col("text")), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet)
      .filter(_._2.nonEmpty)
    val ref = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia != ib
      i = (sa & sb).size if i * 10000 >= 8000 * sa.size
    } yield ((ia, ib), i.toLong * 10000 / sa.size)).toMap
    assert(got == ref)
    assert(ref.nonEmpty, "fixture must exercise the operator")
    // rarest-first probe prefixes: identical result set (for containment
    // the prefix may be ANY fixed-size subset of A, so order choice only
    // tunes candidate-bucket sizes)
    val dford = PrefixJoin.shingleHashContainmentJoin(docs, "doc_id", "text",
        n = 3, threshold = 0.8, dfOrder = true)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(dford == ref)
  }
}
