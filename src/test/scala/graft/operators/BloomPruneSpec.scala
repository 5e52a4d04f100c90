package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {
  import spark.implicits._

  private lazy val orders = graft.sources.Tables.load(spark, SfDir, "orders")
  private lazy val customer = graft.sources.Tables.load(spark, SfDir, "customer")

  test("prunedJoin equals the plain inner join exactly (no false negatives)") {
    val dim = customer.filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey", $"c_mktsegment")
    val got = BloomPrune.prunedJoin(
        orders.withColumnRenamed("o_custkey", "c_custkey"), dim, "c_custkey")
      .select($"o_orderkey").as[Long].collect().toSet
    val want = orders.join(dim, orders("o_custkey") === dim("c_custkey"))
      .select($"o_orderkey").as[Long].collect().toSet
    assert(got == want)
    assert(want.nonEmpty)
  }

  test("the bloom filter actually reduces the fact side pre-shuffle") {
    val dim = customer.filter($"c_custkey" % 50 === 0).select($"c_custkey")
    val pruned = BloomPrune.pruneFact(orders, $"o_custkey", dim, $"c_custkey")
    val (all, kept) = (orders.count(), pruned.count())
    assert(kept < all / 5, s"bloom kept $kept of $all — no real reduction")
    // and never below the true match count (no false negatives)
    val trueMatches = orders.join(dim, orders("o_custkey") === dim("c_custkey")).count()
    assert(kept >= trueMatches)
  }

  test("empty dim side keeps nothing, matching inner-join semantics") {
    val dim = customer.filter(lit(false)).select($"c_custkey")
    assert(BloomPrune.pruneFact(orders, $"o_custkey", dim, $"c_custkey").count() == 0)
  }

  test("the pruning filter is a plan-level Filter before any Exchange, no UDF") {
    val dim = customer.filter($"c_custkey" % 50 === 0).select($"c_custkey")
    val plan = BloomPrune.prunedJoin(
        orders.withColumnRenamed("o_custkey", "c_custkey"),
        dim, "c_custkey")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"expected might_contain in:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"))
  }
}
