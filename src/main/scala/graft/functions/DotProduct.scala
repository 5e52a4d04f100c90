package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two `array<double>` columns as a native Catalyst
  * expression with codegen.
  *
  * The composition `aggregate(zip_with(a, b, _*_), 0.0, _+_)` is
  * CodegenFallback — every pair evaluation leaves whole-stage codegen,
  * allocates a zipped array, and boxes each element. On all-pairs
  * similarity scans (the hot path of near-dup detection) that constant
  * factor dominates; this expression is a primitive-typed loop emitted
  * inline.
  *
  * Numeric parity: accumulates left-to-right (`acc += a(i)*b(i)`) — the
  * exact IEEE operation sequence of both the higher-order-function
  * composition it replaces and DuckDB's `list_dot_product`, so results
  * are bitwise identical across engines (verified against the oracle on
  * the full embeddings pair set).
  *
  * Contract: element nulls are not expected (embedding pipelines produce
  * dense vectors); mismatched lengths yield NULL — the same propagation
  * the zip_with composition had (null padding → null product → null sum),
  * so a truncated/corrupt embedding is filtered out downstream instead of
  * scoring a plausible partial dot product.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(s"dot_product needs two array<double>, got $l, $r")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else DotProduct.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = graft.functions.DotProduct.compute($a, $b);
         |}
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {
  /** The kernel — shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }

  /** Column-facing constructor. */
  def dotProduct(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(DotProduct(
      org.apache.spark.sql.graft.Bridge.expression(a),
      org.apache.spark.sql.graft.Bridge.expression(b)))
}
