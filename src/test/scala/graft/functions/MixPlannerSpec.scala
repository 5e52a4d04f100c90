package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Water-filling closed form vs the iterative reference. */
class MixPlannerSpec extends SparkSpec {
  import spark.implicits._

  private def plan(budgetNum: Long, budgetDen: Long, rows: (String, Long)*) =
    MixPlanner.waterfill(rows.toDF("source", "tk"), col("source"), col("tk"),
        budgetNum, budgetDen)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getLong(3), r.getLong(4)))).toMap

  /** The textbook iterative loop the closed form must reproduce. */
  private def reference(budget: Long, per: Map[String, Long]): Map[String, Long] = {
    var active = per.keySet
    var b = budget
    var rates = Map.empty[String, Long]
    var done = false
    while (!done && active.nonEmpty) {
      val fair = b / active.size
      val sat = active.filter(s => per(s) <= fair)
      if (sat.isEmpty) {
        rates ++= active.map(s => s -> math.min(1000000L, fair * 1000000L / per(s)))
        done = true
      } else {
        rates ++= sat.map(_ -> 1000000L)
        b -= sat.map(per).sum
        active --= sat
      }
    }
    rates
  }

  test("small sources saturate, large ones split the remainder (hand case)") {
    // total 1000, budget 500; fair over 4 = 125 -> a(50) saturates;
    // then fair over 3 = 150 -> b(100) saturates; remaining 350 over 2
    val m = plan(1, 2, ("a", 50L), ("b", 100L), ("c", 350L), ("d", 500L))
    assert(m("a") == ((50L, true, 1000000L, 50L)))
    assert(m("b") == ((100L, true, 1000000L, 100L)))
    val fair = (500L - 150L) / 2
    assert(m("c")._3 == fair * 1000000L / 350L)
    assert(m("d")._3 == fair * 1000000L / 500L)
  }

  test("matches the iterative reference on a skewed grid") {
    val per = (1 to 12).map(i => (s"s$i", (i.toLong * i * 37) % 991 + 10)).toMap
    val got = plan(1, 2, per.toSeq.sortBy(_._1): _*).map { case (s, v) => s -> v._3 }
    val ref = reference(per.values.sum / 2, per)
    assert(got == ref)
  }

  test("budget >= total: everything saturates at rate 1") {
    val m = plan(1, 1, ("a", 10L), ("b", 20L))
    assert(m.values.forall(v => v._2 && v._3 == 1000000L))
  }

  test("planned token sums never exceed the budget") {
    val per = (1 to 9).map(i => (s"s$i", (i.toLong * 131) % 700 + 5))
    val m = plan(1, 3, per: _*)
    val total = per.map(_._2).sum
    assert(m.values.map(_._4).sum <= total / 3)
  }
}
