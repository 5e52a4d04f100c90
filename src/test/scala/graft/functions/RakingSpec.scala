package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RakingSpec extends SparkSpec {
  import spark.implicits._

  test("one row pass exactly equalizes weighted row marginals (hand-checked)") {
    // 2×1 grid: rows a (3 docs), b (1 doc); rowTarget = 4 div 2 = 2.
    // After the row pass: w_a = 1e6·(2e6)/(3e6) = 666666, w_b = 2000000.
    // The col pass over the single column then rescales both by
    // colTarget·1e6/colSum = 4e12/(3·666666 + 1·2000000) = 4e12/3999998.
    val df = (Seq.fill(3)("a") ++ Seq("b")).map((_, "s")).toDF("r", "c")
    val got = Raking.rakeEqualShares(df, "r", "c", iterations = 1)
      .orderBy("rowv").as[(String, String, Long, Long)].collect()
    val wA = 1000000L * 2000000L / 3000000L
    val wB = 1000000L * 2000000L / 1000000L
    val colSum = 3 * wA + 1 * wB
    assert(got.map(_._4).toSeq ===
      Seq(wA * 4000000L / colSum, wB * 4000000L / colSum))
  }

  test("raked marginals approach equal shares on a skewed grid") {
    val docs = (Seq.fill(60)(("en", "web")) ++ Seq.fill(20)(("en", "book")) ++
      Seq.fill(15)(("fr", "web")) ++ Seq.fill(5)(("fr", "book")))
      .toDF("lang", "src")
    val cells = Raking.rakeEqualShares(docs, "lang", "src", iterations = 5)
      .as[(String, String, Long, Long)].collect()
    val total = cells.map(c => c._3 * c._4).sum.toDouble
    val rowShare = cells.groupBy(_._1).view.mapValues(
      _.map(c => c._3 * c._4).sum / total).toMap
    val colShare = cells.groupBy(_._2).view.mapValues(
      _.map(c => c._3 * c._4).sum / total).toMap
    assert(math.abs(rowShare("en") - 0.5) < 0.01, s"row shares $rowShare")
    assert(math.abs(colShare("web") - 0.5) < 0.01, s"col shares $colShare")
  }

  test("applyWeights broadcasts the cell grid and tags every document") {
    val docs = graft.sources.Tables.load(spark, SfDir, "documents")
    val weighted = Raking.applyWeights(docs, "lang", "source")
    assert(weighted.count() === docs.count())
    assert(weighted.filter(col("w_ppm") <= 0L).count() === 0L)
    val plan = weighted.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "cell join must broadcast")
  }
}
