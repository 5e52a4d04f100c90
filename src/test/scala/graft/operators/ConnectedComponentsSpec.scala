package graft.operators

import scala.util.Random

import graft.SparkSpec

/** ConnectedComponents vs a driver-side union-find reference: the
  * distributed large-star/small-star result must equal the exact
  * transitive closure on every graph shape we can throw at it —
  * including the chain worst case that breaks naive min-propagation.
  */
class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Exact reference: path-compressed union-find, min id as root. */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { val (hi, lo) = (math.max(ra, rb), math.min(ra, rb)); parent(hi) = lo }
    }
    // min-root normalization needs a second pass after all unions
    parent.keys.toSeq.map(k => k -> find(k)).toMap
  }

  /** Runs BOTH implementations — the driver union-find fast path
    * (default threshold) and the star iteration (threshold 0) — and
    * pins them equal before returning: every graph shape in this suite
    * checks the paths against each other AND the reference.
    */
  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = edges.toDF("src", "dst")
    val fast = ConnectedComponents.assign(df, "src", "dst")
      .as[(Long, Long)].collect().toMap
    val iterative = ConnectedComponents.assign(df, "src", "dst", smallGraphEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == iterative, "fast path and star iteration diverged")
    fast
  }

  test("random graphs match union-find exactly") {
    val rnd = new Random(7)
    for (trial <- 1 to 5) {
      val n = 40 + trial * 60
      val edges = Seq.fill(n)((rnd.nextInt(trial * 50).toLong, rnd.nextInt(trial * 50).toLong))
        .filter { case (a, b) => a != b }
      val want = unionFind(edges)
      val got = run(edges)
      assert(got == want, s"trial $trial: ${got.size} vs ${want.size} assignments")
    }
  }

  test("chain graph (worst case for naive propagation) collapses to one component") {
    val edges = (0L until 200L).sliding(2).map(w => (w(0), w(1))).toSeq
    val got = run(edges)
    assert(got.size == 200 && got.values.forall(_ == 0L))
  }

  test("two cliques joined by one bridge merge; without it they stay apart") {
    def clique(ids: Seq[Long]) = for (a <- ids; b <- ids if a < b) yield (a, b)
    val apart = run(clique(1L to 5L) ++ clique(10L to 14L))
    assert((1L to 5L).forall(apart(_) == 1L) && (10L to 14L).forall(apart(_) == 10L))
    val joined = run(clique(1L to 5L) ++ clique(10L to 14L) :+ (5L, 10L))
    assert(joined.values.toSet == Set(1L))
  }

  test("self-loops, duplicate and reversed edges, null endpoints are harmless") {
    val df = Seq[(java.lang.Long, java.lang.Long)](
      (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L), (null, 9L), (8L, null), (4L, 5L))
      .toDF("src", "dst")
    val got = ConnectedComponents.assign(df, "src", "dst")
      .as[(Long, Long)].collect().toMap
    // 3 only self-loops, 8/9 only null-partnered: no surviving edge → absent
    assert(got == Map(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L))
  }

  test("empty edge set yields empty assignment") {
    assert(run(Nil).isEmpty)
  }

  test("deterministic across runs") {
    val rnd = new Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter { case (a, b) => a != b }
    assert(run(edges) == run(edges))
  }

  test("star rounds stay within the O(log² n) budget (converges, no maxIter blowup)") {
    // 1000-node chain: naive propagation needs 1000 rounds; the
    // alternating algorithm must finish inside the default 30
    val edges = (0L until 1000L).sliding(2).map(w => (w(0), w(1))).toSeq
    val got = run(edges)
    assert(got.size == 1000 && got.values.forall(_ == 0L))
  }
}
