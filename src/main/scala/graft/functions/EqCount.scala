package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count of positions where two `array<long>` columns hold EQUAL
  * non-null elements — the MinHash agreement kernel, as a native
  * codegen expression (the [[IntSqDist]] pattern, found by the round-9
  * CodegenFallback plan audit: the composition
  * `size(filter(zip_with(a, b, _ === _), x => x))` is two nested
  * interpreted higher-order functions allocating two arrays per
  * evaluation, and the optimizer pushes the Jaccard threshold into the
  * band self-join's CONDITION — so it ran per candidate PAIR in q23's
  * verify step, the exact multiplicity class that made IntSqDist a
  * 10-17× win).
  *
  * Semantics EXACTLY match the composition (so the q23 oracle replays
  * unchanged): positions beyond the shorter array and positions where
  * either side is null simply don't count (zip_with pads with null, `=`
  * yields null, `filter` drops it) — the result is never null.
  */
case class EqCount(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"eq_count needs two array<long>, got $l, $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    EqCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.EqCount.compute($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): EqCount =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "eq_count"
}

object EqCount {
  /** The kernel — shared by interpreted eval and generated code. Null
    * elements and length overhang contribute nothing (the zip_with/
    * filter composition's exact semantics).
    */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i))
        acc += 1L
      i += 1
    }
    acc
  }

  /** Column-facing constructor. */
  def eqCount(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(EqCount(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))
}
