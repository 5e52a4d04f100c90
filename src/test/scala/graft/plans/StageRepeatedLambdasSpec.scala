package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFunctions

/** The auto-staging optimizer rule: a user query that inlines the same
  * lambda subtree twice gets the library's staging discipline applied
  * MECHANICALLY — the optimized plan passes PlanAudit, values are
  * unchanged, and hand-staged plans are left alone.
  */
class StageRepeatedLambdasSpec extends AnyFunSuite {

  lazy val spark: SparkSession = {
    // getOrCreate() would hand back another suite's session and silently
    // skip withExtensions — force a fresh session on the shared context
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stage-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  // parquet-backed (a local Seq would constant-fold into a
  // LocalRelation before the rule could see a Project)
  private def docs =
    graft.sources.Tables.load(spark, "/root/testdata/sf0.001", "documents")

  test("a twice-inlined lambda column is staged: audit-clean plan, identical values") {
    val bad = docs.select(col("doc_id"),
      array_min(TextFunctions.tokens(col("text"))).as("a"),
      array_max(TextFunctions.tokens(col("text"))).as("b"))
    assert(PlanAudit.repeatedLambdas(bad).isEmpty,
      s"rule must leave an audit-clean optimized plan:\n${bad.queryExecution.optimizedPlan}")
    assert(bad.queryExecution.optimizedPlan.toString.contains("__staged_lambda"),
      "the duplicate must be staged below as its own alias")
    val got = bad.orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    val ref = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__t"))
      .select(col("doc_id"), array_min(col("__t")).as("a"),
        array_max(col("__t")).as("b"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("three references collapse to one staged evaluation") {
    val bad = docs.select(
      size(TextFunctions.tokens(col("text"))).as("n"),
      array_min(TextFunctions.tokens(col("text"))).as("lo"),
      array_max(TextFunctions.tokens(col("text"))).as("hi"))
    assert(PlanAudit.repeatedLambdas(bad).isEmpty)
    val plan = bad.queryExecution.optimizedPlan.toString
    // exactly one tokenize in the whole plan: the staged alias
    val tokenizes = "lambdafunction\\(\\(length".r.findAllIn(plan).size
    assert(tokenizes == 1, s"expected one staged tokenize, plan:\n$plan")
    assert(bad.agg(sum(col("n"))).head().getLong(0) > 0)
  }

  test("per-element subtrees that read the enclosing lambda variable are NOT staged") {
    // per-token positional dropout: the filter's body reads the outer
    // lambda's index — hoisting would be wrong; the rule must leave it
    val q = docs.select(col("doc_id"),
      filter(TextFunctions.tokens(col("text")), (_, i) => i % 2 === 0).as("even"),
      TextFunctions.tokens(col("text")).as("all"))
    val rows = q.limit(20).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val all = r.getSeq[String](2)
      assert(r.getSeq[String](1) === all.zipWithIndex.filter(_._2 % 2 == 0).map(_._1),
        s"even-position filter broken for doc ${r.getLong(0)}")
    }
  }

  test("badGen: the inferred isnotnull conjunct is ELIMINATED — plan rewritten clean") {
    // the InferFiltersFromGenerate damage (PlanShapeSpec's canary): a
    // staged lambda column exploded plainly infers
    // `size(e) > 0 AND isnotnull(e)`, and pushdown substitutes the
    // stage back in — tokens() twice in one Filter. The rule must drop
    // the redundant isnotnull (size(null) is null, so the other
    // conjunct already rejects null rows) — REWRITTEN clean, not
    // merely flagged.
    val badGen = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__tk"))
      .select(col("doc_id"), explode(col("__tk")).as("tok"))
    assert(PlanAudit.repeatedLambdas(badGen).isEmpty,
      s"inferred-filter duplicate must be eliminated:\n${badGen.queryExecution.optimizedPlan}")
    // values: identical to the explode_outer + null-filter dodge
    val got = badGen.orderBy("doc_id", "tok").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ref = docs
      .select(col("doc_id"), explode_outer(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull)
      .orderBy("doc_id", "tok").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got === ref)
    assert(got.nonEmpty)
  }

  test("duplicated lambda in Aggregate expressions stages below the aggregate") {
    val bad = docs.groupBy(col("lang"))
      .agg(sum(size(TextFunctions.tokens(col("text")))).as("n"),
        max(size(array_distinct(TextFunctions.tokens(col("text"))))).as("d"))
    assert(PlanAudit.repeatedLambdas(bad).isEmpty,
      s"aggregate-shape duplicate must be staged:\n${bad.queryExecution.optimizedPlan}")
    val plan = bad.queryExecution.optimizedPlan.toString
    assert(plan.contains("__staged_lambda"), "expected a staged alias below the Aggregate")
    assert("lambdafunction\\(\\(length".r.findAllIn(plan).size == 1,
      s"expected exactly one staged tokenize:\n$plan")
    // values identical to the hand-staged form
    val got = bad.orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    val ref = docs
      .select(col("lang"), TextFunctions.tokens(col("text")).as("__t"))
      .groupBy(col("lang"))
      .agg(sum(size(col("__t"))).as("n"), max(size(array_distinct(col("__t")))).as("d"))
      .orderBy("lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got === ref && got.nonEmpty)
  }

  test("duplicated lambda inside one generator stages below the Generate") {
    val bad = docs.select(col("doc_id"),
      explode(concat(TextFunctions.tokens(col("text")),
        TextFunctions.tokens(col("text")))).as("tok"))
    assert(PlanAudit.repeatedLambdas(bad).isEmpty,
      s"generator-shape duplicate must be staged:\n${bad.queryExecution.optimizedPlan}")
    // each token appears exactly twice (concat of the list with itself)
    val ref = docs
      .select(col("doc_id"), explode_outer(TextFunctions.tokens(col("text"))).as("tok"))
      .filter(col("tok").isNotNull).count()
    assert(bad.count() == 2 * ref)
  }

  test("the documented gap: a genuine user-authored Filter duplicate stays flagged") {
    // pushdown substitutes Project aliases into filter conditions with
    // no cost guard (scaladoc KNOWN GAP) — the rule cannot stage this
    // shape; the audit must still surface it for source-level fixing
    val bad = docs
      .filter(size(TextFunctions.tokens(col("text"))) > 2 &&
        array_contains(TextFunctions.tokens(col("text")), "the"))
      .select(col("doc_id"))
    assert(PlanAudit.repeatedLambdas(bad).nonEmpty,
      "the un-stageable Filter class must remain visible to the audit")
  }

  test("an already-staged plan is left unchanged (stable fixpoint with CollapseProject)") {
    val good = docs
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("__t"))
      .select(col("doc_id"), array_min(col("__t")).as("a"),
        array_max(col("__t")).as("b"))
    assert(PlanAudit.repeatedLambdas(good).isEmpty)
    assert(!good.queryExecution.optimizedPlan.toString.contains("__staged_lambda"),
      "hand-staged plans must not be rewritten")
    assert(good.count() == 500)
  }
}
