package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.explode_outer

/** `explode` for EXPENSIVE (lambda-built) array columns.
  *
  * Catalyst's `InferFiltersFromGenerate` rewrites `explode(e)` into
  * `Filter(size(e) > 0 AND isnotnull(e)) + Generate(explode(e))`, and the
  * inferred filter inlines `e` straight through any staging Projects — so
  * an array built from higher-order lambdas (`filter`/`transform`, which
  * are CodegenFallback and invisible to subexpression elimination) is
  * re-evaluated several times per input row. Measured on the trigram
  * pipeline: the inferred filter alone re-tokenized ~8× per row, turning a
  * 0.7 s explode into 24 s at sf0.1.
  *
  * The rule cannot fire on `explode_outer` (an inferred filter would drop
  * the rows outer-explode must keep), so `heavy(e)` = `explode_outer(e)`
  * + a post-Generate null filter on the OUTPUT attribute. Identical to
  * `explode(e)` for arrays whose elements are never null (every token /
  * n-gram / key array in this library — `split`, `concat_ws`, hash
  * builders cannot produce null elements); arrays WITH null elements
  * would lose them, so keep plain `explode` there.
  *
  * Usage: `df.select(..., Explode.heavy(arr).as("x")).filter(col("x").isNotNull)`
  * — the null filter must be added by the caller AFTER the generate (it
  * references the output attribute, which this helper cannot name).
  * Prefer [[graft.util.Explode.heavyCol]] via select+filter helpers in
  * call sites.
  */
object Explode {
  def heavy(e: Column): Column = explode_outer(e)
}
