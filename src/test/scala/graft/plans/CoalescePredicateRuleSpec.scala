package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Own session: extensions must be injected at build time. */
class CoalescePredicateRuleSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate() would hand back another suite's session and silently
    // skip withExtensions — force a fresh session on the shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("2021-06-01 00:00:00"), "2021-01-01 00:00:00"),
      (2L, None, "2021-07-01 00:00:00"),
      (3L, Some("2020-01-01 00:00:00"), "2021-08-01 00:00:00"),
      (4L, None, "2019-01-01 00:00:00"),
    ).toDF("id", "m", "c")
      .select($"id", to_timestamp($"m").as("m"), to_timestamp($"c").as("c"))
  }

  test("coalesce >= literal is decomposed and results are null-exact") {
    import spark.implicits._
    val q = df.filter(coalesce($"m", $"c") >= lit("2021-05-01 00:00:00").cast("timestamp"))
    // row 1: m qualifies; row 2: m null, c qualifies; row 3: m fails (c ignored!); row 4: both fail
    assert(q.select($"id").as[Long].collect().toSet == Set(1L, 2L))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("coalesce"),
      s"coalesce survived optimization:\n$optimized")
  }

  test("between range over coalesce decomposes too") {
    import spark.implicits._
    val q = df.filter(coalesce($"m", $"c")
      .between(lit("2021-05-01").cast("timestamp"), lit("2021-07-31").cast("timestamp")))
    assert(q.select($"id").as[Long].collect().toSet == Set(1L, 2L))
    assert(!q.queryExecution.optimizedPlan.toString.toLowerCase.contains("coalesce"))
  }

  test("simhash64 is callable from SQL via the extension registration") {
    import spark.implicits._
    val n = spark.sql(
      "SELECT simhash64(array('a','b','c')) AS h").as[Long].head()
    assert(n != 0L)
  }

  test("rule does not fire on plain predicates") {
    import spark.implicits._
    val q = df.filter($"c" >= lit("2021-02-01").cast("timestamp"))
    assert(q.select($"id").as[Long].collect().toSet == Set(2L, 3L))
  }
}
