package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** [[KnnAMeanFold]] must be BIT-identical to the shape it replaced
  * (typed TopKByScore pass + `sort_array(collect_list)` ascending
  * 0.0-seeded fold) — the a-mean values are hashed by the DuckDB
  * oracle through q241/q244, so "close" is not enough.
  */
class KnnAMeanFoldSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced shape, verbatim (the pre-r12 imiKnnAMeansOver tail). */
  private def oldShape(scored: org.apache.spark.sql.DataFrame, knn: Int) =
    Similarity.topkOf(scored, knn, "__mq")
      .groupBy(col("__mq").as("id"))
      .agg(sort_array(collect_list(col("cos"))).as("cs"))
      .select(col("id"),
        (aggregate(col("cs"), lit(0.0d), (acc, x) => acc + x)
          / size(col("cs"))).as("a"),
        element_at(col("cs"), 1).as("ck"),
        size(col("cs")).cast("long").as("nk"))

  private def newShape(scored: org.apache.spark.sql.DataFrame, knn: Int) =
    scored.groupBy(col("__mq").as("id"))
      .agg(KnnAMeanFold(col("cos"), knn).as("__f"))
      .select(col("id"), col("__f").getField("a").as("a"),
        col("__f").getField("ck").as("ck"), col("__f").getField("nk").as("nk"))

  private def bits(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long, Long)] =
    df.select(col("id"), col("a"), col("ck"), col("nk"))
      .collect()
      .map(r => (r.getLong(0),
        java.lang.Double.doubleToRawLongBits(r.getDouble(1)),
        java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        r.getLong(3))).toSet

  test("bit-identical to the TopKByScore + sorted-collect fold it replaced") {
    // deterministic mixed stream: dense groups (> knn pairs), sparse
    // groups (< knn), exact value TIES at the k boundary, negative and
    // tiny values, many partitions so partial/merge paths both run
    val rows = (0 until 5000).map { i =>
      val g = (i % 37).toLong
      val c = math.sin(i * 0.7) * (if (i % 5 == 0) 1e-7 else 1.0)
      (g, i.toLong, if (i % 11 == 0) math.sin((i - 11) * 0.7) else c)
    } ++ (100 until 110).map(i => (1000L + i, i.toLong, 0.5)) // nk < knn
    val scored = rows.toDF("__mq", "neighbor_id", "cos").repartition(32)
    // 16 exercises the selection-formula merge at a width the chained-
    // insert shape could not plan (its shared-carry DAG walks as
    // ~C(2k,k) tree paths — the r12 review finding)
    for (knn <- Seq(1, 2, 4, 7, 16)) {
      val (o, n) = (bits(oldShape(scored, knn)), bits(newShape(scored, knn)))
      assert(o == n, s"knn=$knn: fold diverged from the replaced shape")
    }
  }

  test("merge path: pre-aggregated partials equal the single-pass fold") {
    val rows = (0 until 2000).map(i => ((i % 7).toLong, i.toLong,
      math.cos(i * 1.3)))
    val scored = rows.toDF("__mq", "neighbor_id", "cos")
    // 64 partitions on 7 groups forces every group through many merges
    for (knn <- Seq(4, 16)) {
      val many = bits(newShape(scored.repartition(64), knn))
      val one = bits(newShape(scored.coalesce(1), knn))
      assert(many == one, s"knn=$knn")
    }
  }

  test("the plan aggregates on HashAggregate, never ObjectHashAggregate/SortAggregate") {
    val scored = (0 until 100).map(i => ((i % 5).toLong, i.toLong, i * 0.1))
      .toDF("__mq", "neighbor_id", "cos")
    val plan = newShape(scored, 4).queryExecution.executedPlan.toString
    assert(plan.contains("HashAggregate"), plan)
    assert(!plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
      s"the fold must stay on HashAggregate (the whole point):\n$plan")
  }
}
