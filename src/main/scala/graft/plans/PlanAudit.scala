package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, HigherOrderFunction, NamedLambdaVariable}

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

  /** ALL higher-order subtrees of `e` that read at least one attribute
    * — nested occurrences count too: two DIFFERENT maximal lambdas each
    * wrapping the same inner lambda subtree (q87's `int8(v)` under both
    * a stringify-transform and a sum-aggregate) still evaluate that
    * inner subtree once EACH per row.
    */
  private def allHofs(e: Expression): Seq[Expression] = e match {
    case h: HigherOrderFunction
        if h.exists(_.isInstanceOf[AttributeReference]) =>
      h +: h.children.flatMap(allHofs)
    case other => other.children.flatMap(allHofs)
  }

  /** True when every lambda variable inside `e` is bound by one of
    * `e`'s OWN (possibly nested) lambdas — i.e. the subtree's value is
    * fixed per row and hoistable to argument position. A reference to
    * an ENCLOSING lambda's variable (q123's per-token `exists(spans,
    * pos ∈ span)`) makes the subtree genuinely per-element — inherent
    * semantics, not a pathology.
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

  /** Human-readable findings for every repeated-lambda occurrence in the
    * DataFrame's optimized logical plan; empty = clean. Two patterns:
    * the same canonicalized lambda subtree appearing more than once
    * inside one operator (per-ROW re-evaluation), and a row-constant
    * lambda subtree sitting inside another lambda's BODY (per-ELEMENT
    * re-evaluation — interpreted higher-order eval re-computes body
    * subtrees for every element, so `x => ... / array_max(f(v))` scans
    * `v` dim times per row; row-constant operands belong in ARGUMENT
    * position, e.g. via array_repeat/zip_with).
    */
  def repeatedLambdas(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    val findings = scala.collection.mutable.ArrayBuffer[String]()
    plan.foreach { node =>
      val hofs = node.expressions.flatMap(allHofs)
      hofs.groupBy(_.canonicalized).valuesIterator.foreach { occ =>
        if (occ.size > 1)
          findings += s"${node.nodeName}: `${occ.head.sql.take(160)}` " +
            s"evaluated ${occ.size}x per row in one operator"
      }
      hofs.collect { case h: HigherOrderFunction => h }.foreach { h =>
        h.functions.foreach { f =>
          f.foreach {
            case inner: HigherOrderFunction
                if inner.exists(_.isInstanceOf[AttributeReference]) &&
                  rowConstant(inner) =>
              findings += s"${node.nodeName}: row-constant lambda subtree " +
                s"`${inner.sql.take(160)}` inside a lambda BODY — " +
                "re-evaluated per element; hoist to argument position"
            case _ => ()
          }
        }
      }
    }
    findings.toSeq
  }

  /** Cross-BRANCH recompute detector — the class [[repeatedLambdas]]
    * cannot see (it is a per-operator property): the same canonicalized
    * SUBPLAN containing lambda work appearing more than once in one
    * query's optimized plan means every consumer re-executes it
    * (q103's exact+simhash dedup ran three times — 5.40 → 3.87 s from
    * one checkpoint). Persisted/checkpointed stages do NOT trip this:
    * they resolve to InMemoryRelation/LogicalRDD leaves before the
    * optimizer runs, so anything still duplicated here is genuinely
    * recomputed. ADVISORY, not enforced: recompute-over-cache is
    * sometimes the right call (a cheap map re-run beats caching a wide
    * relation), so [[graft.tools.LambdaAudit]] reports these for
    * review instead of PlanShapeSpec failing the build.
    */
  /** Interpreted-kernel audit (the round-8 IntSqDist lesson,
    * generalized): a CodegenFallback expression — every higher-order
    * function, `from_json`, and any Expression without `doGenCode` —
    * leaves whole-stage codegen and pays interpreter dispatch + boxing
    * per evaluation. That is noise in a per-row map over a scan, and a
    * 10–17× multiplier when the evaluation count is (candidate PAIRS)
    * or (rows × centroids): the integer-ANN family shipped a full round
    * of shape bake-offs around an interpreted kernel before anyone
    * noticed the kernel WAS the bottleneck. Flags the three hot shapes:
    *
    *  1. a fallback subtree in a JOIN CONDITION — evaluated per
    *     candidate pair, the worst multiplicity there is;
    *  2. an attribute-reading fallback subtree in an operator sitting
    *     ON A JOIN'S OUTPUT (unary chain down to a Join) — per
    *     surviving pair (the IVFADC scoring-select site);
    *  3. more than [[MaxFallbackPerOperator]] attribute-reading
    *     fallback subtrees in ONE operator — the chained-literal
    *     kernel shape (448 interpreted distance subtrees per row).
    *
    * PlanShapeSpec runs this over every gate + auditable bench twin
    * with a per-query whitelist of justified sites (bounded shortlist
    * streams, reconstruction zip_withs); a new query that re-introduces
    * an interpreted kernel under a join fails the build.
    */
  val MaxFallbackPerOperator = 16

  def codegenFallbacks(df: DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Project, Filter => LFilter}
    val plan = df.queryExecution.optimizedPlan
    val findings = scala.collection.mutable.ArrayBuffer[String]()
    // maximal fallback subtrees: count an interpreted region once, not
    // once per nested fallback node
    def maximal(e: Expression): Seq[Expression] = e match {
      case f: CodegenFallback => Seq(f)
      case other => other.children.flatMap(maximal)
    }
    def attrReading(e: Expression): Boolean =
      e.exists(_.isInstanceOf[AttributeReference])
    // a unary Project/Filter chain ending at a Join = expressions run
    // on the pair stream
    @scala.annotation.tailrec
    def overJoin(p: LogicalPlan): Boolean = p match {
      case _: Join => true
      case pr: Project => overJoin(pr.child)
      case f: LFilter => overJoin(f.child)
      case _ => false
    }
    plan.foreach { node =>
      node match {
        case j: Join =>
          j.condition.toSeq.flatMap(maximal).filter(attrReading).foreach { f =>
            findings += s"Join condition: interpreted `${f.sql.take(140)}` " +
              "evaluated per candidate pair"
          }
        case p: Project if overJoin(p.child) =>
          p.projectList.flatMap(maximal).filter(attrReading).foreach { f =>
            findings += s"Project over join output: interpreted " +
              s"`${f.sql.take(140)}` evaluated per surviving pair"
          }
        case f: LFilter if overJoin(f.child) =>
          maximal(f.condition).filter(attrReading).foreach { e =>
            findings += s"Filter over join output: interpreted " +
              s"`${e.sql.take(140)}` evaluated per surviving pair"
          }
        case _ => ()
      }
      val cnt = node.expressions.flatMap(maximal).count(attrReading)
      if (cnt > MaxFallbackPerOperator)
        findings += s"${node.nodeName}: $cnt interpreted (CodegenFallback) " +
          "subtrees in one operator — the chained-kernel shape; use a " +
          "codegen Expression (DotProduct/IntSqDist pattern) or the matrix form"
    }
    findings.toSeq
  }

  def recomputedLambdaSubplans(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.optimizedPlan
    val counts = scala.collection.mutable.Map[org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, (Int, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)]()
    plan.foreach { node =>
      val heavy = node.expressions.exists(_.exists {
        case h: HigherOrderFunction => h.exists(_.isInstanceOf[AttributeReference])
        case _ => false
      })
      if (heavy) {
        val key = node.canonicalized
        val (n, _) = counts.getOrElse(key, (0, node))
        counts(key) = (n + 1, node)
      }
    }
    counts.collect { case (_, (n, node)) if n > 1 =>
      s"subplan with lambda work executes ${n}x (no materialization " +
        s"between consumers): ${node.nodeName} `" +
        node.expressions.headOption.map(_.sql.take(120)).getOrElse("") + "`"
    }.toSeq
  }
}
