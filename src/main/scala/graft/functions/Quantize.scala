package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding quantization — the storage/bandwidth lever for vector
  * corpora: float32 embeddings quantized to int8 shrink 4× before they
  * ever shuffle or land in parquet, and ANN candidate generation works
  * unchanged on the quantized form (re-rank on full precision if
  * needed).
  *
  * Symmetric per-vector scheme: `q_i = round(127 · v_i / max|v|)`,
  * clamped to [-127, 127]; the all-zero vector quantizes to zeros.
  * Rounding is `floor(x + 0.5)` — explicitly, because engines disagree
  * on round-half semantics and the gate hash-compares every element
  * across engines. Pure higher-order-function arithmetic (`transform`/
  * `aggregate`), per-row, no shuffle, no UDF.
  */
object Quantize {

  /** int8 codes as an `array<long>` column (parquet has no int8 array;
    * values are all in [-127, 127]).
    */
  def int8(vec: Column): Column = {
    // vmax rides in ARGUMENT position (array_repeat), never in the
    // lambda body: interpreted higher-order eval re-computes a body
    // subtree PER ELEMENT, so the old `x => ... / vmax` form re-ran the
    // array_max(transform(abs)) scan dim times per row — O(dim²)/row
    // (the round-6 lambda-body rule, found by PlanAudit's body check)
    val vmax = array_max(transform(vec, x => abs(x.cast("double"))))
    zip_with(transform(vec, _.cast("double")),
      array_repeat(vmax, size(vec)),
      (x, m) =>
        when(m === 0.0, lit(0L)).otherwise(
          greatest(lit(-127L), least(lit(127L),
            floor(x * 127.0 / m + 0.5).cast("long")))))
  }

  /** Reconstruction scale for [[int8]] (`v ≈ q · scale`). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0

  /** Sign-bit (1-bit) quantization packed into `dim / blockBits`
    * big-endian integer blocks: within block `b`, the element at
    * position `b·blockBits + i` contributes bit `blockBits-1-i`
    * (MSB-first fold `acc·2 + (v>0)`), so Hamming distance between two
    * vectors is `Σ_b bit_count(xor(a_b, c_b))` — a 32× smaller
    * representation than float32 and the standard first-pass filter
    * for billion-vector search (re-rank survivors on full precision).
    *
    * Blocks of ≤62 bits keep every partial fold value positive and in
    * BIGINT range, which is what makes the SAME packing expressible as
    * a plain integer sum in any engine (the gate's DuckDB oracle
    * replays it as `Σ bit·2^(blockBits-i)`). Pure higher-order-function
    * arithmetic, per-row, no shuffle, no UDF.
    */
  def signBits(vec: Column, dim: Int, blockBits: Int = 32): Column = {
    require(blockBits >= 1 && blockBits <= 62, s"blockBits $blockBits not in [1,62]")
    require(dim % blockBits == 0, s"dim $dim not a multiple of blockBits $blockBits")
    val nBlocks = dim / blockBits
    array((0 until nBlocks).map { b =>
      aggregate(
        slice(vec, b * blockBits + 1, blockBits),
        lit(0L),
        (acc, x) => acc * 2L + when(x.cast("double") > 0d, 1L).otherwise(0L))
    }: _*)
  }
}
