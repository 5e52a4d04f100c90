package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def ks(rows: Seq[(String, Long)]): Map[String, (Long, Long)] =
    Drift.ksPerGroup(rows.toDF("g", "v"), col("g"), col("v"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("identical distributions give KS = 0") {
    val rows = for (g <- Seq("a", "b"); v <- 1L to 10L) yield (g, v)
    val out = ks(rows)
    assert(out("a") == ((10L, 0L)) && out("b") == ((10L, 0L)))
  }

  test("disjoint supports give KS = 10000 (maximal drift)") {
    val rows = (1L to 10L).map(v => ("lo", v)) ++ (11L to 20L).map(v => ("hi", v))
    val out = ks(rows)
    assert(out("lo") == ((10L, 10000L)) && out("hi") == ((10L, 10000L)))
  }

  test("hand-computed asymmetric case matches the cross-multiplied formula") {
    // g: {1, 2}; rest: {2, 3, 3}. Step points 1,2,3:
    //   v=1: |1*3 - 0*2| = 3 ; v=2: |2*3 - 1*2| = 4 ; v=3: |6-6| = 0
    //   D = 4/6 -> floor(10000*4/6) = 6666
    val rows = Seq(("g", 1L), ("g", 2L), ("r", 2L), ("r", 3L), ("r", 3L))
    val out = ks(rows)
    assert(out("g") == ((2L, 6666L)), s"got ${out("g")}")
  }

  test("a group covering the whole corpus is excluded (no rest to compare)") {
    val out = ks(Seq(("only", 1L), ("only", 2L)))
    assert(out.isEmpty)
  }

  test("partition-invariant and grid-complete (sup found at a value the group lacks)") {
    // g has no mass at v=5 where rest steps hard — the dense grid must
    // still evaluate the gap there
    val rows = Seq(("g", 1L), ("g", 9L)) ++ Seq.fill(8)(("r", 5L))
    val df = rows.toDF("g", "v")
    val a = Drift.ksPerGroup(df, col("g"), col("v")).orderBy("group").collect().toSeq
    val b = Drift.ksPerGroup(df.repartition(5), col("g"), col("v"))
      .orderBy("group").collect().toSeq
    assert(a == b)
    // at v=5: F_g = 1/2, F_rest = 8/8 -> D = 1/2
    val g = a.find(_.getString(0) == "g").get
    assert(g.getLong(2) == 5000L, s"got ${g.getLong(2)}")
  }
}
