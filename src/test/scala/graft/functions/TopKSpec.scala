package graft.functions

import graft.SparkSpec

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals the window-sort answer on random scores") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(i => (i % 13L, i.toLong, rnd.nextInt(1000) / 100.0))
    val df = rows.toDF("query_id", "neighbor_id", "cos")
    // window reference answer
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    val expected = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 10)
      .select($"query_id", $"neighbor_id", $"cos")
      .as[(Long, Long, Double)].collect().toSet
    // aggregator answer via the public Similarity path on fabricated vectors
    // — exercise TopKByScore directly through the same grouping shape
    val agg = new TopKByScore(10).toColumn
    val got = df.as[(Long, Long, Double)]
      .groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg)
      .flatMap { case (q, top) => top.map(t => (q, t._1, t._2)) }
      .collect().toSet
    assert(got == expected)
  }

  test("merge keeps the bound and ordering across partitions") {
    val ds = (1 to 1000).map(i => (1L, i.toLong, i.toDouble)).toDF("q", "id", "s")
      .repartition(16)
      .as[(Long, Long, Double)]
    val agg = new TopKByScore(3).toColumn
    val got = ds.groupByKey(_._1).mapValues(r => (r._2, r._3)).agg(agg).collect().head._2
    assert(got == Seq((1000L, 1000.0), (999L, 999.0), (998L, 998.0)))
  }
}
