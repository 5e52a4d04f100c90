package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.catalyst.expressions.XXH64

/** Fused MinHash signature: token hashes → rolling shingle hashes → k
  * permutation minima, in ONE codegen'd pass.
  *
  * The column-function pipeline (`rollingShingleHashes` +
  * `minhashSignature`) is built from higher-order functions
  * (transform/aggregate/array_min), which are CodegenFallback: every doc
  * allocates the shingle array, then k transformed copies of it, each
  * element boxed. The k·|shingles| rehash loop is the hot path of corpus
  * dedup — this expression runs it over primitive longs with no
  * intermediate arrays.
  *
  * Hash parity (bit-for-bit with the column pipeline it replaces):
  *  - shingle hash of window i = xxhash64(th[i..i+L-1]) = fold
  *    `h = hashLong(th[j], h)` from seed 42 — Spark's XxHash64 over L
  *    long children;
  *  - short docs (<L tokens) collapse to ONE whole-doc hash =
  *    `aggregate(th, 42L, (acc, h) => xxhash64(acc, h))` =
  *    acc' = hashLong(h, hashLong(acc, 42));
  *  - signature element p = min over shingles s of xxhash64(s, p) where
  *    p is an INT literal = hashInt(p, hashLong(s, 42)) — XxHash64
  *    dispatches on the child's type, so the permutation index hashes as
  *    a 4-byte int, not a long.
  */
case class MinHashSig(child: Expression, k: Int, shingleLen: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(s"minhash_sig needs array<long>, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k, shingleLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSig.compute($c, $k, $shingleLen);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSig {
  private def hashLong(l: Long, seed: Long): Long = XXH64.hashLong(l, seed)

  /** The kernel — shared by interpreted eval and generated code. */
  def compute(th: ArrayData, k: Int, shingleLen: Int): ArrayData = {
    val n = th.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    // one reusable window over the token hashes; no shingle array lands
    def feed(shingleHash: Long): Unit = {
      val base = hashLong(shingleHash, 42L)
      var p = 0
      while (p < k) {
        val h = XXH64.hashInt(p, base)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
    }
    if (n < shingleLen) {
      var acc = 42L
      var i = 0
      while (i < n) { acc = hashLong(th.getLong(i), hashLong(acc, 42L)); i += 1 }
      feed(acc)
    } else {
      var i = 0
      while (i <= n - shingleLen) {
        var h = 42L
        var j = 0
        while (j < shingleLen) { h = hashLong(th.getLong(i + j), h); j += 1 }
        feed(h)
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Column-facing constructor. */
  def minhashSig(tokenHashes: Column, k: Int, shingleLen: Int): Column =
    org.apache.spark.sql.graft.Bridge.column(MinHashSig(
      org.apache.spark.sql.graft.Bridge.expression(tokenHashes), k, shingleLen))
}
