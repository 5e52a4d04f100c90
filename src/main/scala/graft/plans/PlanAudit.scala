package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, HigherOrderFunction}

/** Static audit for the interpreted-lambda re-evaluation class (the
  * round-6 postmortem family, SCALE.md): higher-order functions
  * (`transform`/`filter`/`zip_with`…) are CodegenFallback and invisible
  * to subexpression elimination, so a plan in which ONE operator holds
  * the same lambda-bearing expression twice really evaluates it twice
  * per row — q204 burned 164 s at sf0.1 exactly this way, and only
  * convention ("stage lambda columns, reference once") prevented query
  * #220 from reintroducing it. This walker makes the class structurally
  * impossible: PlanShapeSpec runs it over every gate query's OPTIMIZED
  * plan (post-CollapseProject, post-InferFiltersFromGenerate — the tree
  * that actually executes) and fails the build on any repeat.
  *
  * The flagged pattern: the same canonicalized maximal higher-order
  * subtree occurring more than once within a single operator's
  * expressions — two output columns of one Project both inlining
  * `tokens(text)`; one expression referencing it in both a size() guard
  * and a slice; or the `InferFiltersFromGenerate`/predicate-pushdown
  * damage where an inferred filter re-states a staged lambda column
  * twice (`size(e) > 0 AND isnotnull(e)` — the reason the library
  * explodes lambda arrays via `explode_outer` + null filter, see
  * [[graft.util.Explode]]; on Spark 4.1 the inference skips DIRECT
  * lambda inputs but still fires on staged attribute inputs, whose
  * producing Project the pushdown then substitutes back in).
  *
  * Literal-only lambdas (no attribute references) are ignored: they are
  * per-query constants, not per-row work.
  */
object PlanAudit {

  /** Maximal higher-order subtrees of `e` that read at least one
    * attribute — nested HOFs inside a flagged subtree count as part of
    * it (the outermost evaluation is the unit of per-row cost).
    */
  private def maximalHofs(e: Expression): Seq[Expression] = e match {
    case h: HigherOrderFunction
        if h.exists(_.isInstanceOf[AttributeReference]) => Seq(h)
    case other => other.children.flatMap(maximalHofs)
  }

  /** Human-readable findings for every repeated-lambda occurrence in the
    * DataFrame's optimized logical plan; empty = clean.
    */
  def repeatedLambdas(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    val findings = scala.collection.mutable.ArrayBuffer[String]()
    plan.foreach { node =>
      val hofs = node.expressions.flatMap(maximalHofs)
      hofs.groupBy(_.canonicalized).valuesIterator.foreach { occ =>
        if (occ.size > 1)
          findings += s"${node.nodeName}: `${occ.head.sql.take(160)}` " +
            s"evaluated ${occ.size}x per row in one operator"
      }
    }
    findings.toSeq
  }
}
