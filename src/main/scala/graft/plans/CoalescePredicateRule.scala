package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: decompose comparisons over `coalesce(a, b)` into
  * per-column disjunctions so each branch is independently pushable
  * (SURVEY.md §2.3 F3 / §4).
  *
  *   coalesce(a,b) >= x   →   (a IS NOT NULL AND a >= x)
  *                             OR (a IS NULL AND b >= x)
  *
  * This is the NULL-exact form — always semantics-preserving, unlike the
  * reference's looser `(a >= x OR b >= x)` (ingest_mysql_data.py:254-262)
  * which silently assumes `b` non-null and a domain where `a >= b`; that
  * looser, index-friendlier shape stays where the assumption is checked:
  * the JDBC pushdown builder (sources.Incremental.pushdownWhere).
  *
  * Why a rule at all: after decomposition each disjunct references one
  * source column, so data-source filter pushdown (parquet row-group
  * pruning, JDBC index use) can act on branches that a coalesce() call
  * defeats entirely.
  */
object CoalescePredicateRule extends Rule[LogicalPlan] {

  private def decompose(cmp: Expression => Expression, a: Expression, b: Expression): Expression =
    Or(And(IsNotNull(a), cmp(a)), And(IsNull(a), cmp(b)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val rewritten = cond.transformUp {
        case GreaterThanOrEqual(Coalesce(Seq(a, b)), v: Literal) =>
          decompose(GreaterThanOrEqual(_, v), a, b)
        case GreaterThan(Coalesce(Seq(a, b)), v: Literal) =>
          decompose(GreaterThan(_, v), a, b)
        case LessThanOrEqual(Coalesce(Seq(a, b)), v: Literal) =>
          decompose(LessThanOrEqual(_, v), a, b)
        case LessThan(Coalesce(Seq(a, b)), v: Literal) =>
          decompose(LessThan(_, v), a, b)
        // NOTE: no combined-BETWEEN case — transformUp decomposes the GTE
        // and LTE children first, so an And(GTE(coalesce), LTE(coalesce))
        // pattern can never be reached here
      }
      if (rewritten fastEquals cond) f else Filter(rewritten, child)
  }
}

/** Session extensions: inject the coalesce-predicate rewrite, the
  * repeated-lambda auto-staging rule ([[StageRepeatedLambdas]]) and
  * register the engine's SQL functions (`simhash64`). Activate with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => CoalescePredicateRule)
    ext.injectOptimizerRule(_ => StageRepeatedLambdas)
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("simhash64"),
        new ExpressionInfo(classOf[graft.functions.SimHash64].getName, "simhash64"),
        (children: Seq[Expression]) => graft.functions.SimHash64(children.head)))
    ext.injectFunction(
      (new org.apache.spark.sql.catalyst.FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[graft.functions.DotProduct].getName, "dot_product"),
        (children: Seq[Expression]) => {
          require(children.length == 2,
            s"dot_product(array<double>, array<double>) takes 2 arguments, got ${children.length}")
          graft.functions.DotProduct(children(0), children(1))
        }))
  }
}
