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
    val v = transform(vec, _.cast("double"))
    val vmax = array_max(transform(v, x => abs(x)))
    transform(v, x =>
      when(vmax === 0.0, lit(0L)).otherwise(
        greatest(lit(-127L), least(lit(127L),
          floor(x * 127.0 / vmax + 0.5).cast("long")))))
  }

  /** Reconstruction scale for [[int8]] (`v ≈ q · scale`). */
  def int8Scale(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / 127.0
}
