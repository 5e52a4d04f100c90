package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, HigherOrderFunction, IsNotNull, NamedExpression, NamedLambdaVariable, PredicateHelper}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, LogicalPlan, Project}
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
  * Beyond Project (round-8 extensions):
  *
  *  - **Aggregate**: duplicated row-constant lambda subtrees in grouping
  *    or aggregate expressions stage into a Project below the aggregate
  *    (`sum(size(tokens(text))), max(size(array_distinct(tokens(text))))`
  *    tokenized twice per input row). Stable in the fixpoint because
  *    `CollapseProject.canCollapseExpressions` refuses to re-inline a
  *    non-cheap alias referenced more than once into an Aggregate.
  *    Subtrees containing aggregate functions are never staged (they are
  *    not per-input-row values).
  *  - **Filter, the inferred-damage class**: `InferFiltersFromGenerate`
  *    (and constraint inference generally) emits
  *    `isnotnull(e) AND size(e) > 0` where `e` is a lambda subtree — two
  *    evaluations per row. The rule DROPS the redundant `isnotnull(e)`
  *    conjunct whenever another conjunct reaches an occurrence of `e`
  *    through an all-null-intolerant path (if `e` is null that conjunct
  *    is null, so the AND already rejects the row) — semantics identical,
  *    one evaluation fewer, and the fix survives every later batch
  *    because nothing moved.
  *  - **Generate**: a generator whose expression holds the same lambda
  *    subtree twice (`explode(concat(tokens(t), tokens(t)))`) stages it
  *    below the Generate; the original output is restored by a Project
  *    above.
  *
  * KNOWN GAP — duplicated lambdas in a Filter beyond the inferred
  * `isnotnull` class (a user writing `size(tokens(t)) > 2 AND
  * array_contains(tokens(t), 'x')`) are NOT staged: on Spark 4.1 both
  * `PushPredicateThroughNonJoin` (same fixpoint batch as this rule) and
  * physical planning's `PhysicalOperation`/`ScanOperation` substitute
  * Project aliases into filter conditions with NO cost guard
  * (`AliasHelper.replaceAlias`, verified against the 4.1.2 bytecode), so
  * a staging Project below a Filter is re-inlined — in the same fixpoint
  * (oscillation) or at physical planning (silent undo). The audit
  * ([[PlanAudit.repeatedLambdas]]) still FLAGS such plans; the
  * source-level dodges are the library's own: filter on a non-nullable
  * derived COUNT (`coalesce` + cheap pre-filter) or restructure via
  * `explode_outer` + null filter (graft.util.Explode).
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
object StageRepeatedLambdas extends Rule[LogicalPlan] with PredicateHelper {

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

  /** The OUTERMOST duplicated stageable lambda canonicals among `exprs`
    * (inner shared subtrees become duplicates of the staging Project and
    * stage on the next fixpoint iteration).
    */
  private def outerDuplicates(exprs: Seq[Expression],
                              childOutput: org.apache.spark.sql.catalyst.expressions.AttributeSet): Seq[Expression] = {
    val hofs = exprs.flatMap(allHofs)
    val dupGroups = hofs.groupBy(_.canonicalized).values
      .filter(_.size > 1).map(_.head)
      .filter(h => h.deterministic && rowConstant(h) &&
        h.references.subsetOf(childOutput) &&
        // an aggregate-bearing subtree is not a per-input-row value —
        // it cannot be hoisted below an Aggregate
        !h.exists(_.isInstanceOf[AggregateExpression]))
      .toSeq
    dupGroups.filterNot { h =>
      dupGroups.exists(o => !(o eq h) &&
        o.exists(_.canonicalized == h.canonicalized))
    }
  }

  private def stageAliases(outer: Seq[Expression]): Seq[Alias] =
    outer.zipWithIndex.map { case (h, i) => Alias(h, s"__staged_lambda_$i")() }

  private def replaceStaged(e: Expression,
                            byCanon: Map[Expression, org.apache.spark.sql.catalyst.expressions.Attribute]): Expression =
    e.transformDown {
      case sub if byCanon.contains(sub.canonicalized) && rowConstant(sub) =>
        byCanon(sub.canonicalized)
    }

  /** True when `conj` reaches an occurrence of `target` through an
    * all-null-intolerant path from its root: target null ⇒ conj null ⇒
    * the enclosing AND rejects the row, so a separate
    * `isnotnull(target)` conjunct is redundant.
    */
  private def coversNull(conj: Expression, target: Expression): Boolean = {
    // `Size` does not override nullIntolerant, but with
    // legacySizeOfNull=false (the default since 3.0) size(null) IS null
    // — and `size(e) > 0` is exactly what InferFiltersFromGenerate
    // emits, so the inferred-damage class hinges on this case
    def propagatesNull(e: Expression): Boolean = e match {
      case s: org.apache.spark.sql.catalyst.expressions.Size => !s.legacySizeOfNull
      case other => other.nullIntolerant
    }
    def reach(e: Expression): Boolean =
      if (e.canonicalized == target.canonicalized) true
      else propagatesNull(e) && e.children.exists(reach)
    !(conj.canonicalized == target.canonicalized) && reach(conj)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(exprs, child) =>
      val outer = outerDuplicates(exprs, child.outputSet)
      if (outer.isEmpty) p
      else {
        val aliases = stageAliases(outer)
        val byCanon = aliases.map(a => a.child.canonicalized -> a.toAttribute).toMap
        val newExprs = exprs.map(replaceStaged(_, byCanon)
          .asInstanceOf[NamedExpression])
        Project(newExprs, Project(child.output ++ aliases, child))
      }

    case a @ Aggregate(grouping, aggExprs, child, hint) =>
      val outer = outerDuplicates(grouping ++ aggExprs, child.outputSet)
      if (outer.isEmpty) a
      else {
        val aliases = stageAliases(outer)
        val byCanon = aliases.map(al => al.child.canonicalized -> al.toAttribute).toMap
        Aggregate(
          grouping.map(replaceStaged(_, byCanon)),
          aggExprs.map(replaceStaged(_, byCanon).asInstanceOf[NamedExpression]),
          Project(child.output ++ aliases, child), hint)
      }

    case f @ Filter(cond, child) =>
      // the inferred-damage class only (see the KNOWN GAP note): drop
      // isnotnull(e) conjuncts on lambda-bearing subtrees another
      // null-intolerant conjunct already covers
      val conjuncts = splitConjunctivePredicates(cond)
      val redundant = conjuncts.filter {
        case n @ IsNotNull(x)
            if x.deterministic && rowConstant(x) &&
              x.exists(_.isInstanceOf[HigherOrderFunction]) =>
          conjuncts.exists(c => !(c eq n) && c.deterministic && coversNull(c, x))
        case _ => false
      }
      if (redundant.isEmpty) f
      else Filter(
        conjuncts.filterNot(c => redundant.exists(_ eq c)).reduce(
          org.apache.spark.sql.catalyst.expressions.And(_, _)),
        child)

    case g @ Generate(generator, unrequiredChildIndex, outer0, qualifier,
        generatorOutput, child) =>
      val outer = outerDuplicates(Seq(generator), child.outputSet)
      if (outer.isEmpty) g
      else {
        val aliases = stageAliases(outer)
        val byCanon = aliases.map(a => a.child.canonicalized -> a.toAttribute).toMap
        val newGen = replaceStaged(generator, byCanon)
          .asInstanceOf[org.apache.spark.sql.catalyst.expressions.Generator]
        // child output positions are preserved (aliases appended), so
        // unrequiredChildIndex stays valid; the wrapper Project restores
        // the original output (drops the staged passthrough columns)
        Project(g.output,
          Generate(newGen, unrequiredChildIndex, outer0, qualifier,
            generatorOutput, Project(child.output ++ aliases, child)))
      }
  }
}
