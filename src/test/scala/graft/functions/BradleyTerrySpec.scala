package graft.functions

import graft.SparkSpec

/** Bradley–Terry MM iteration: ordering, symmetry, degenerate cases. */
class BradleyTerrySpec extends SparkSpec {
  import spark.implicits._

  private def run(iters: Int, rows: (String, String, Long)*) =
    BradleyTerry.strengths(rows.toDF("winner", "loser", "n"), iters)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("a dominant item ends strongest; a winless item ends weakest") {
    // a beats b 9:1, b beats c 9:1, a beats c 10:0
    val m = run(3, ("a", "b", 9L), ("b", "a", 1L), ("b", "c", 9L),
      ("c", "b", 1L), ("a", "c", 10L))
    assert(m("a")._2 > m("b")._2 && m("b")._2 > m("c")._2)
    assert(m("a")._1 == 19L && m("b")._1 == 10L && m("c")._1 == 1L)
  }

  test("perfect symmetry keeps strengths equal at every iteration") {
    val m = run(3, ("x", "y", 5L), ("y", "x", 5L))
    assert(m("x")._2 == m("y")._2)
  }

  test("strengths are normalized: sum ~ m * 1e6 (floor slack only)") {
    val m = run(3, ("a", "b", 3L), ("b", "c", 4L), ("c", "a", 5L))
    val tot = m.values.map(_._2).sum
    assert(tot <= 3000000L && tot > 3000000L - 10L)
  }

  test("a never-winning item converges toward zero strength") {
    val m = run(5, ("a", "z", 50L), ("b", "z", 50L), ("a", "b", 1L), ("b", "a", 1L))
    assert(m("z")._2 < m("a")._2 / 10L)
  }

  test("item-universe cap fails loudly") {
    val pairs = (1 to 300).map(i => (s"i$i", s"j$i", 1L))
    intercept[IllegalArgumentException] {
      BradleyTerry.strengths(pairs.toDF("winner", "loser", "n"), 1)
    }
  }
}
