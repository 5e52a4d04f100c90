package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed size of a string column as a native Catalyst
  * expression — the compressibility quality signal of published corpus
  * curation (Gopher/RefinedWeb family): highly compressible documents
  * are repetitive boilerplate or machine-generated filler, nearly
  * incompressible ones are often binary junk or encrypted spam; both
  * tails get filtered by compressed/raw byte-ratio thresholds.
  *
  * No oracle analog exists (DuckDB exposes no deflate), so this is
  * spec-pinned: the spec round-trips the kernel against
  * `java.util.zip.Inflater` and pins the monotonicity contract
  * (repetitive text compresses far below shuffled text of the same
  * length).
  *
  * Per-row cost is a Deflater pass over the UTF-8 bytes; the Deflater
  * instance is THREAD-LOCAL (alloc-free steady state, safe under
  * whole-stage codegen's single-threaded per-task execution). Level 6
  * (zlib default) pinned explicitly — the signal must be stable across
  * JDK default changes.
  */
case class DeflateSize(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"deflate_size needs string, got $t")
  }

  override protected def nullSafeEval(s: Any): Any =
    DeflateSize.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateSize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateSize =
    copy(child = newChild)

  override def prettyName: String = "deflate_size"
}

object DeflateSize {
  private val local = new ThreadLocal[Deflater] {
    override def initialValue(): Deflater = new Deflater(6)
  }

  /** Compressed byte count of the UTF-8 encoding (RAW deflate stream,
    * level 6). Deterministic: zlib's output for a given (input, level)
    * is fixed by the algorithm, not the platform.
    */
  def compute(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = local.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = new Array[Byte](64)
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }

  def deflateSize(c: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(DeflateSize(
      org.apache.spark.sql.graft.Bridge.expression(c)))

  /** Compressibility ratio in integer basis points:
    * ⌊10000 × deflate_bytes / utf8_bytes⌋ (empty → 10000,
    * "incompressible"). Low = repetitive/templated; ~10000+ =
    * random/binary-like. (floor of the double quotient is exact here:
    * the numerator stays far below 2^53.)
    */
  def compressionBp(c: Column): Column = {
    import org.apache.spark.sql.functions._
    when(octet_length(c) === 0, lit(10000L))
      .otherwise(floor(lit(10000L) * deflateSize(c).cast("long")
        / octet_length(c).cast("long")).cast("long"))
  }
}
