package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-integer eval arithmetic with an overflow-WIDENED twin behind
  * the same API. The gate/bench shape is `widen = false`: plain int64
  * sums/products — the fastest exact form, whose bounds are documented
  * per metric below, and Spark's ANSI mode turns an exceeded bound into
  * a loud SparkArithmeticException, never a silent wrap. Past the bound
  * (u2 beyond ~2·10⁹ docs per class, lift beyond ~3·10⁶ users/shard,
  * TWAP past ~9·10⁹ cents·s per key) callers flip `widen = true`: the
  * overflow-prone accumulators and products run in `decimal(38,0)` —
  * exact integers to 10³⁸, still partial-aggregable, still one plan
  * shape — and every RATIO column keeps its int64 type (`div` on
  * decimals is the same truncating integral divide, and the quotients
  * are bounded small by construction). ExactEvalsSpec property-tests
  * the widened paths against a driver-side BigInt reference at
  * magnitudes far past 2⁶³.
  */
object ExactEvals {

  /** Widen to exact decimal(38,0) when asked, else leave int64. */
  private def w(c: Column, widen: Boolean): Column =
    if (widen) c.cast("decimal(38,0)") else c

  /** Exact tied ROC-AUC in basis points from the pre-aggregated
    * DISTINCT-SCORE grid `(score, p, n)` (one row per distinct score
    * with positive/negative counts — the corpus reduces to this grid in
    * one partial-agg pass, so this window runs over a corpus-size-
    * independent table). 2U = Σ p·(2·cum_n + n) — Mann-Whitney with
    * ties at half; u2 ≤ 2·P·N overflows int64 past ~2.1·10⁹ docs per
    * class, the `widen` bound is P·N < 5·10³⁷.
    * Output: (n_pos, n_neg, u2, auc_bp) — auc_bp ∈ [0, 10000] is
    * always a long.
    */
  def aucBpFromGroups(grp: DataFrame, widen: Boolean = false): DataFrame = {
    val win = Window.orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, -1)
    grp.select(col("score"), w(col("p"), widen).as("p"),
        w(col("n"), widen).as("n"))
      .withColumn("cum_n", coalesce(sum(col("n")).over(win), w(lit(0L), widen)))
      .agg(sum(col("p")).as("n_pos"), sum(col("n")).as("n_neg"),
        sum(col("p") * (w(lit(2L), widen) * col("cum_n") + col("n"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        expr("""CASE WHEN n_pos = 0 OR n_neg = 0 THEN CAST(0 AS BIGINT)
                ELSE (10000 * u2) div (2 * n_pos * n_neg) END""").as("auc_bp"))
  }

  /** Market-basket support/lift arithmetic over a pre-joined counts
    * table `(type_a, type_b, co, cnt_a, cnt_b, n_users)`:
    * support_bp = (10⁴·co) div n_users,
    * lift_ppm = (10⁶·co·n_users) div (cnt_a·cnt_b).
    * int64-exact while 10⁶·co·n_users < 2⁶³ — ~3·10⁶ users per shard
    * at worst-case co; `widen` is exact to 10³⁸ on the triple product.
    */
  def pairLiftFromCounts(counts: DataFrame, widen: Boolean = false): DataFrame =
    counts
      .withColumn("__co", w(col("co"), widen))
      .withColumn("__nu", w(col("n_users"), widen))
      .withColumn("__ca", w(col("cnt_a"), widen))
      .withColumn("__cb", w(col("cnt_b"), widen))
      .select(col("type_a"), col("type_b"), col("co"), col("cnt_a"),
        col("cnt_b"),
        expr("(10000 * __co) div __nu").as("support_bp"),
        expr("(1000000 * __co * __nu) div (__ca * __cb)").as("lift_ppm"))

  /** Per-key time-weighted average price from `(user_id, cents, dur_s)`
    * segments: twap_sc = (10⁶·Σ cents·dur) div Σ dur. int64-exact while
    * each key's Σ cents·dur < 2⁶³ (~9·10⁹ cents-seconds at $1M prices);
    * `widen` carries both sums in decimal(38,0) (dur_s and wsum widen,
    * twap_sc stays a long).
    */
  def twapFromSegments(segs: DataFrame, widen: Boolean = false): DataFrame =
    segs.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_seg"),
        sum(w(col("dur_s"), widen)).as("dur_s"),
        sum(w(col("cents"), widen) * w(col("dur_s"), widen)).as("wsum"))
      .select(col("user_id"), col("n_seg"), col("dur_s"), col("wsum"),
        when(col("dur_s") === 0L, lit(0L))
          .otherwise(expr("(1000000 * wsum) div dur_s")).as("twap_sc"))

  /** Per-key weighted mean in 10⁶-scaled integers from weighted rows:
    * (key, n_eff = Σw, mean = (10⁶·Σ w·x) div Σw) — the Poisson-
    * bootstrap replica aggregate. int64-exact while Σ w·x < 2⁶³;
    * `widen` carries Σw and Σw·x in decimal(38,0).
    */
  def weightedMeanSc(df: DataFrame, key: Column, weight: Column, x: Column,
                     keyName: String, meanName: String,
                     widen: Boolean = false): DataFrame =
    df.groupBy(key.as(keyName))
      .agg(sum(w(weight, widen)).as("n_eff"),
        sum(w(weight, widen) * w(x, widen)).as("wsum"))
      .select(col(keyName), col("n_eff"),
        expr("(1000000 * wsum) div n_eff").as(meanName))
}
