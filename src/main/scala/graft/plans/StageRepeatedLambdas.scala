package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, HigherOrderFunction, NamedLambdaVariable}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: automatically STAGE duplicated higher-order (lambda)
  * subtrees — the library's repeated-lambda discipline ([[PlanAudit]],
  * SCALE.md round-6/7 postmortems) applied mechanically to plans the
  * library's own queries never produce but a USER's will: higher-order
  * functions are CodegenFallback and invisible to subexpression
  * elimination, so a Project computing
  *
  *   array_min(tokens(text)) AS a, array_max(tokens(text)) AS b
  *
  * really tokenizes twice per row. This rule rewrites any Project whose
  * expressions contain the same canonicalized lambda subtree more than
  * once into two Projects — the duplicate aliased ONCE below, attribute
  * reads above:
  *
  *   Project [array_min(__sl0) AS a, array_max(__sl0) AS b]
  *   +- Project [text, filter(split(lower(text)), …) AS __sl0]
  *
  * Safety: only deterministic, ROW-CONSTANT subtrees are staged (a
  * subtree reading an enclosing lambda's variable is genuinely
  * per-element and cannot be hoisted — same bound-variable analysis as
  * PlanAudit); occurrences inside lambda BODIES are replaced too, which
  * additionally hoists per-element re-evaluation out of interpreted
  * lambdas. Only the OUTERMOST duplicated canonicals stage per pass —
  * the optimizer batch runs to fixpoint, so nested shared subtrees
  * stage on the next iteration (the staging Project is itself a
  * Project). The result is a stable fixpoint with `CollapseProject`,
  * whose cost model refuses to re-inline a non-cheap alias referenced
  * more than once — exactly the shape this rule produces.
  *
  * Registered by [[GraftExtensions]]; opt-in like every extension
  * (`.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object StageRepeatedLambdas extends Rule[LogicalPlan] {

  private def allHofs(e: Expression): Seq[Expression] = e match {
    case h: HigherOrderFunction
        if h.exists(_.isInstanceOf[AttributeReference]) =>
      h +: h.children.flatMap(allHofs)
    case other => other.children.flatMap(allHofs)
  }

  /** Bound-variable analysis (PlanAudit's): true when every lambda
    * variable in `e` is bound by `e`'s own lambdas — the subtree's value
    * is per-row, so it may be hoisted to a projection column.
    */
  private def rowConstant(e: Expression): Boolean = {
    val bound = e.collect {
      case l: org.apache.spark.sql.catalyst.expressions.LambdaFunction =>
        l.arguments.map(_.exprId)
    }.flatten.toSet
    !e.exists {
      case v: NamedLambdaVariable => !bound(v.exprId)
      case _ => false
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(exprs, child) =>
      val hofs = exprs.flatMap(allHofs)
      val dupGroups = hofs.groupBy(_.canonicalized).values
        .filter(_.size > 1).map(_.head)
        .filter(h => h.deterministic && rowConstant(h) &&
          h.references.subsetOf(child.outputSet))
        .toSeq
      // stage only the OUTERMOST duplicated canonicals this pass; inner
      // shared subtrees become duplicates of the staging Project below
      // and stage on the optimizer batch's next fixpoint iteration
      val outer = dupGroups.filterNot { h =>
        dupGroups.exists(o => !(o eq h) &&
          o.exists(_.canonicalized == h.canonicalized))
      }
      if (outer.isEmpty) p
      else {
        val aliases = outer.zipWithIndex.map { case (h, i) =>
          Alias(h, s"__staged_lambda_$i")()
        }
        val byCanon = aliases.map(a => a.child.canonicalized -> a.toAttribute).toMap
        val newExprs = exprs.map {
          _.transformDown {
            case sub if byCanon.contains(sub.canonicalized) && rowConstant(sub) =>
              byCanon(sub.canonicalized)
          }.asInstanceOf[org.apache.spark.sql.catalyst.expressions.NamedExpression]
        }
        Project(newExprs, Project(child.output ++ aliases, child))
      }
  }
}
