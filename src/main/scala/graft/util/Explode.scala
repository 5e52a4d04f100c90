package graft.util

/** DOC-ONLY anchor: how to `explode` EXPENSIVE (lambda-built) array
  * columns. Comments across the library cite `graft.util.Explode` for
  * this rule; there is deliberately no code here — the fix is an idiom
  * applied inline at each call site, not a wrapper (a one-line alias of
  * `explode_outer` hid the post-Generate null filter the caller must
  * add, and was dead code in practice).
  *
  * The rule: Catalyst's `InferFiltersFromGenerate` rewrites `explode(e)`
  * into `Filter(size(e) > 0 AND isnotnull(e)) + Generate(explode(e))`,
  * and the inferred filter inlines `e` straight through any staging
  * Projects — so an array built from higher-order lambdas
  * (`filter`/`transform`, which are CodegenFallback and invisible to
  * subexpression elimination) is re-evaluated several times per input
  * row. Measured on the trigram pipeline: the inferred filter alone
  * re-tokenized ~8× per row, turning a 0.7 s explode into 24 s at sf0.1.
  *
  * The rule cannot fire on `explode_outer` (an inferred filter would drop
  * the rows outer-explode must keep), so the idiom is `explode_outer(e)`
  * + a post-Generate null filter on the OUTPUT attribute:
  *
  * {{{
  *   df.select(..., explode_outer(arr).as("x")).filter(col("x").isNotNull)
  * }}}
  *
  * Identical to `explode(e)` for arrays whose elements are never null
  * (every token / n-gram / key array in this library — `split`,
  * `concat_ws`, hash builders cannot produce null elements); arrays WITH
  * null elements would lose them, so keep plain `explode` there.
  */
object Explode
