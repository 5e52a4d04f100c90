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
  * Contract: mismatched lengths AND element nulls yield NULL — the same
  * propagation the zip_with composition had (null element → null product
  * → null sum), so a truncated/corrupt/sparse embedding is filtered out
  * downstream instead of scoring a plausible partial dot product. When
  * both array types are statically `containsNull = false` the per-element
  * null check is compiled out.
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

  private def elementsNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  })

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    if (x.numElements() != y.numElements()) null
    else if (elementsNullable) DotProduct.computeOrNull(x, y)
    else DotProduct.compute(x, y)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      if (elementsNullable)
        s"""
           |java.lang.Double ${ev.value}_r = null;
           |if ($a.numElements() == $b.numElements()) {
           |  ${ev.value}_r = graft.functions.DotProduct.computeOrNull($a, $b);
           |}
           |if (${ev.value}_r == null) {
           |  ${ev.isNull} = true;
           |} else {
           |  ${ev.value} = ${ev.value}_r.doubleValue();
           |}
         """.stripMargin
      else
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

  /** Null-checking kernel for arrays whose type admits element nulls:
    * any null element poisons the whole product to NULL (one boxed return
    * per pair; the loop itself stays primitive).
    */
  def computeOrNull(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
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
