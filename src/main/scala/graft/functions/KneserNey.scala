package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interpolated Kneser–Ney bigram language model over a corpus — the
  * standard smoothed n-gram LM (Kneser & Ney 1995; Chen & Goodman 1999)
  * behind kenlm-style quality scoring, in exact rational arithmetic.
  *
  * With absolute discount D = 3/4 the interpolated bigram probability
  *
  *   p_KN(w2|w1) = max(c(w1w2) − D, 0)/c(w1) + λ(w1)·p_cont(w2)
  *     λ(w1)     = D·N1+(w1·)/c(w1)
  *     p_cont(w2) = N1+(·w2)/B
  *
  * is a single rational with denominator 4·c(w1)·B:
  *
  *   p_KN = [ (4·c12 − 3)⁺·B + 3·N1+(w1·)·N1+(·w2) ] / (4·c1·B)
  *
  * (c12 ≥ 1 for observed bigrams, so the clamp never binds on the
  * emitted rows). Numerator and denominator are exact integers, and the
  * emitted fixed-point `kn_e9 = (10⁹·num) div den` is engine-portable —
  * the DuckDB oracle (q231) replays it bit-for-bit. Both are widened to
  * decimal(38,0)/HUGEINT before the multiply: at corpus scale B is
  * billions and 10⁹·c12·B overflows int64.
  *
  * 100 TB shape: one map-side-combined shuffle collapses the token
  * stream to bigram TYPE counts; everything after runs on the type
  * relation (≪ token volume): continuation counts are per-w1/per-w2
  * re-aggregations of it, B is a 1-row aggregate crossed in. The type
  * relation feeds four consumers and is eagerly checkpointed once.
  */
object KneserNey {

  /** Per-bigram interpolated KN probabilities at fixed-point 1e9.
    *
    * @return (w1, w2, c12, c1, n1_fwd, n1_bwd, kn_e9) for every observed
    *         bigram type: raw count, left-context count, distinct
    *         continuations of w1, distinct left-contexts of w2, and the
    *         exact-integer KN probability.
    */
  def bigramProbs(docs: DataFrame, textCol: Column): DataFrame = {
    val types = docs
      .select(TextFunctions.tokens(textCol).as("__t"))
      .select(explode_outer(TextFunctions.ngrams(col("__t"), 2)).as("__bg"))
      .filter(col("__bg").isNotNull)
      .select(split(col("__bg"), " ", 2).getItem(0).as("w1"),
        split(col("__bg"), " ", 2).getItem(1).as("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c12"))
      .localCheckpoint(true) // four consumers below
    val perW1 = types.groupBy(col("w1"))
      .agg(sum(col("c12")).as("c1"), count(lit(1)).as("n1_fwd"))
    val perW2 = types.groupBy(col("w2"))
      .agg(count(lit(1)).as("n1_bwd"))
    val b = types.agg(count(lit(1)).as("__B"))
    types
      .join(perW1, Seq("w1"))
      .join(perW2, Seq("w2"))
      .crossJoin(broadcast(b))
      .select(col("w1"), col("w2"), col("c12"), col("c1"),
        col("n1_fwd"), col("n1_bwd"),
        expr("""(1000000000 * (greatest(4 * cast(c12 as decimal(38,0)) - 3, 0) * __B
                               + 3 * cast(n1_fwd as decimal(38,0)) * n1_bwd))
                div (4 * cast(c1 as decimal(38,0)) * __B)""")
          .cast("long").as("kn_e9"))
  }
}
