package graft.sink

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly") {
    // x=0b101, y=0b011 → z bits: x→even positions, y→odd:
    // i0: x1@0, y1@1; i1: x0@2, y1@3; i2: x1@4, y0@5 → 0b011011 = 27
    val got = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), 3).as("z")).as[Long].head()
    assert(got == 27L)
  }

  test("zValue masks inputs to the bit budget and stays in codegen arithmetic") {
    val z = Seq(((1L << 40) + 5L, 3L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), 3).as("z")).as[Long].head()
    assert(z == 27L, "high bits beyond the budget must not leak")
    val plan = Seq((1L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq($"x", $"y"), 3))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
  }

  test("z-ordered layout prunes files on the TRAILING column where linear sort can't") {
    val orders = graft.sources.Tables.load(spark, SfDir, "orders")
      .select($"o_orderkey",
        ($"o_custkey" % 256).as("x"),
        least(expr("CAST(round(o_totalprice*100) AS BIGINT) div 250000"), lit(255L)).as("y"))
    val tmp = Files.createTempDirectory("graft-zorder").toString
    val linear = s"$tmp/linear"
    val zed = s"$tmp/zed"
    // linear: leading-column sort — y spans nearly everything in each file
    TxTable.append(spark,
      orders.repartitionByRange(8, $"x").sortWithinPartitions($"x"),
      linear, statsCols = Seq("x", "y"))
    ZOrder.appendZOrdered(spark, orders, zed,
      clusterCols = Seq("x", "y"), bits = 8, nFiles = 8)
    // box predicate on y only (the trailing dimension)
    val (lo, hi) = ("40", "80")
    val linFiles = TxTable.prunedFiles(spark, linear, "y", Some(lo), Some(hi)).size
    val zFiles = TxTable.prunedFiles(spark, zed, "y", Some(lo), Some(hi)).size
    assert(linFiles == 8, s"linear layout should keep every file, kept $linFiles")
    assert(zFiles < linFiles, s"z-order must prune: $zFiles vs $linFiles")
    // pruning never changes results
    val expect = orders.filter($"y".between(40, 80)).count()
    val got = TxTable.readPruned(spark, zed, "y", Some(lo), Some(hi))
      .filter($"y".between(40, 80)).count()
    assert(got == expect)
  }
}
