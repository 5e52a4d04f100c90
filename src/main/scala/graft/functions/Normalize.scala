package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the first
  * transform of every real text-curation pipeline (crawled text mixes
  * precomposed and combining-sequence forms of the same grapheme;
  * un-normalized corpora split token statistics, break exact dedup, and
  * leak near-identical training examples across hash-based splits).
  *
  * Spark ships no normalization function, and a Scala UDF would box
  * every row out of whole-stage codegen; this is the [[DotProduct]]
  * pattern — a UnaryExpression whose generated code calls one static
  * kernel. The kernel fast-paths the (overwhelmingly common) already-
  * normalized case with `Normalizer.isNormalized` — ASCII and NFC text
  * returns the INPUT UTF8String, zero allocation.
  *
  * Cross-engine parity: java.text.Normalizer and DuckDB's
  * `nfc_normalize` both implement UAX #15 canonical composition, so
  * outputs are byte-identical (q105 hash-matches full normalized text).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nfc_normalize needs string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    NfcNormalize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

object NfcNormalize {
  /** Shared kernel: already-NFC input (the common case — all ASCII is)
    * returns the input reference untouched.
    */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  def nfc(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(NfcNormalize(
      org.apache.spark.sql.graft.Bridge.expression(c)))
}
