package graft.operators

import scala.util.Random

import graft.SparkSpec

/** PageRank vs a driver-side exact-integer reference: the distributed
  * iteration must reproduce the fixed-point recurrence bit-for-bit on
  * every graph shape (the whole point of the integer formulation is
  * that there is exactly ONE correct output), and must be invariant to
  * input partitioning.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Exact reference: the same recurrence in driver-side Long math. */
  private def reference(edges: Seq[(Long, Long, Long)], iters: Int,
                        scale: Long = 1000000000L): Map[Long, Long] = {
    val agg = edges.filter(_._3 > 0)
      .groupBy(e => (e._1, e._2)).map { case ((s, d), es) => (s, d, es.map(_._3).sum) }.toSeq
    val outw = agg.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nodes = (agg.map(_._1) ++ agg.map(_._2)).distinct.sorted
    if (nodes.isEmpty) return Map.empty
    val base = scale / nodes.size
    val tele = 15L * base / 100L
    var r = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val inflow = agg.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => r(s) * w / outw(s) }.sum
      }
      r = nodes.map(n => n -> (tele + 85L * inflow.getOrElse(n, 0L) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.run(edges.toDF("s", "d", "w"), "s", "d", "w", iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("hand graph matches the exact-integer reference at every iteration count") {
    // two hubs, a tail, a self-loop, a parallel edge (summed), a dangler target
    val edges = Seq[(Long, Long, Long)](
      (1, 2, 3), (1, 3, 1), (2, 1, 2), (3, 1, 1), (3, 3, 2),
      (1, 2, 1), (2, 4, 5)) // 4 has no out-edges: dangling
    for (k <- 0 to 6)
      assert(run(edges, k) == reference(edges, k), s"iters=$k")
  }

  test("random graphs match the reference (structure fuzz)") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val n = 2 + rnd.nextInt(20)
      val edges = Seq.fill(5 + rnd.nextInt(60))(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong, 1L + rnd.nextInt(9)))
      assert(run(edges, 4) == reference(edges, 4), s"trial=$trial edges=$edges")
    }
  }

  test("partitioning-invariant: 1 partition == 7 partitions") {
    val edges = Seq.fill(80)((Random.nextInt(12).toLong, Random.nextInt(12).toLong, 2L))
    val df1 = edges.toDF("s", "d", "w").repartition(1)
    val df7 = edges.toDF("s", "d", "w").repartition(7)
    val r1 = PageRank.run(df1, "s", "d", "w", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r7 = PageRank.run(df7, "s", "d", "w", 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r1 == r7)
  }

  test("mass conservation bound: total rank never exceeds SCALE") {
    val edges = Seq[(Long, Long, Long)]((1, 2, 1), (2, 3, 1), (3, 1, 1))
    for (k <- Seq(0, 3, 10)) {
      val total = run(edges, k).values.sum
      assert(total <= 1000000000L, s"iters=$k total=$total")
      // no dangling nodes here, so decay is only div truncation: stays close
      assert(total > 990000000L, s"iters=$k total=$total")
    }
  }

  test("empty and degenerate inputs") {
    assert(run(Seq.empty, 5) == Map.empty)
    // zero/negative weights dropped; all-dropped graph is empty
    assert(run(Seq((1L, 2L, 0L)), 3) == Map.empty)
    // single self-loop keeps all its mass (minus truncation)
    val loop = run(Seq((7L, 7L, 4L)), 3)
    assert(loop.keySet == Set(7L) && loop(7L) > 990000000L)
  }

  test("overflow guard fails loudly") {
    val huge = Seq((1L, 2L, Long.MaxValue / 1000L))
    val e = intercept[IllegalArgumentException](run(huge, 1))
    assert(e.getMessage.contains("overflow"))
  }
}
