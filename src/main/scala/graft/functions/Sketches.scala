package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distinct-count sketches for corpus accounting at 100 TB — vocabulary
  * sizes, dedup-rate estimation, per-source cardinality — where exact
  * countDistinct shuffles every distinct value and a sketch shuffles a
  * CONSTANT: HyperLogLog (Flajolet et al. 2007) and K-Minimum-Values
  * (Bar-Yossef et al. 2002), both built ENGINE-PORTABLY:
  *
  *  - hashes are the library's 60-bit md5-prefix longs, so any SQL
  *    engine reproduces every register/minimum bit for bit;
  *  - estimators run in EXACT integer arithmetic (scaled harmonic sums
  *    as `Σ 2^(52−rank)` longs; KMV's `(k−1)·2⁶⁰ div h_k` in
  *    decimal(38,0)) — no float accumulation order to drift, so the
  *    ESTIMATES themselves hash-match a DuckDB oracle, which is how the
  *    gate verifies them (q221/q222/q223);
  *  - the small-range (linear-counting) correction needs a float ln and
  *    is deliberately NOT applied in-engine: the estimator emits the raw
  *    est plus the zero-register count so a caller can correct
  *    client-side. Gate inputs sit far outside the correction zone.
  *
  * Shapes: HLL registers are one hash-aggregate to ≤ 2^p rows
  * (mergeable: union register tables and re-max — the sketch of a union
  * IS the max-merge of sketches, pinned by SketchesSpec); KMV's k
  * smallest distinct hashes plan as TakeOrderedAndProject (per-partition
  * top-k, k·partitions rows to the driver-side merge — never a global
  * sort).
  */
object Hll {

  private def hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  /** Register table (reg, rank): reg = h mod 2^p, rank = leading-zero
    * count of the remaining 60−p hash bits + 1 (via minimal-width
    * `bin()`, identical in Spark and DuckDB). One partial-agg pass,
    * ≤ 2^p output rows; union + re-max merges sketches.
    */
  def registers(df: DataFrame, value: Column, p: Int = 9): DataFrame = {
    require(p >= 4 && p <= 14, s"p must be in [4,14], got $p")
    val m = 1 << p
    val wBits = 60 - p
    df.select(hash60(value).as("__h"))
      // a NULL value hashes to NULL: without this filter it would emit a
      // null register row that inflates n_regs (deflating n_zero_regs and
      // s_scaled) — nulls carry no distinct value, so they're dropped
      .filter(col("__h").isNotNull)
      .select((col("__h") % m).cast("int").as("reg"),
        expr(s"__h div $m").as("__w"))
      .select(col("reg"),
        when(col("__w") === 0L, lit(wBits + 1))
          .otherwise(lit(wBits) - length(bin(col("__w"))) + 1)
          .cast("int").as("rank"))
      .groupBy(col("reg")).agg(max(col("rank")).as("rank"))
  }

  /** Raw HLL estimate from a register table, exact integers end to end:
    * the harmonic sum is carried scaled by 2^(61−p)
    * (`s_scaled = Σ_observed 2^(61−p−rank) + empty·2^(61−p)`, ≤ 2^61 —
    * inside int64), and
    * `est = (alpha_ppm · m² · 2^(61−p)) div (10⁶ · s_scaled)` runs in
    * decimal(38,0). alpha_ppm = round(10⁶·0.7213/(1+1.079/m)), the
    * standard bias constant for m ≥ 128, frozen to an integer so both
    * engines use the identical literal. Output:
    * (n_regs, n_zero_regs, s_scaled, est).
    */
  def estimate(regs: DataFrame, p: Int = 9): DataFrame = {
    require(p >= 7 && p <= 14, s"the alpha constant needs m >= 128; got p=$p")
    val m = 1 << p
    val shift = 61 - p
    val alphaPpm = math.round(0.7213 / (1 + 1.079 / m) * 1e6)
    regs
      .agg(count(lit(1)).as("n_regs"),
        sum(expr(s"cast(1 as bigint) << ($shift - rank)")).as("__s_obs"))
      .select(col("n_regs"),
        (lit(m.toLong) - col("n_regs")).as("n_zero_regs"),
        (col("__s_obs") + (lit(m.toLong) - col("n_regs")) * lit(1L << shift))
          .as("s_scaled"))
      .select(col("n_regs"), col("n_zero_regs"), col("s_scaled"),
        expr(s"""(cast($alphaPpm as decimal(38,0)) * ${m.toLong} * ${m.toLong}
                  * ${1L << shift}) div
                 (1000000 * cast(s_scaled as decimal(38,0)))""").as("est"))
  }

  /** registers + estimate in one call. */
  def distinctEstimate(df: DataFrame, value: Column, p: Int = 9): DataFrame =
    estimate(registers(df, value, p), p)

  /** The small-range (linear-counting) correction [[estimate]]
    * deliberately leaves to the CALLER (it needs a float `ln`, which
    * would break the exact-integer oracle): when the raw estimate sits
    * in the biased zone (est ≤ 2.5·m) and zero registers remain, the
    * linear-counting estimator m·ln(m / n_zero_regs) is the standard
    * replacement (Flajolet et al. 2007 §4). Driver-side scalar over the
    * one-row estimator output — no distributed work.
    */
  def correctedEstimate(nZeroRegs: Long, m: Int, rawEst: Long): Long =
    if (rawEst <= (5L * m) / 2 && nZeroRegs > 0)
      math.round(m.toDouble * math.log(m.toDouble / nZeroRegs))
    else rawEst
}

/** K-Minimum-Values distinct sketch: keep the k smallest distinct
  * 60-bit hashes; `est = (k−1)·2⁶⁰ div h_(k)` (the k-th smallest), or
  * the exact count when fewer than k distinct values exist (the sketch
  * then IS the value set). Unlike HLL the retained hashes support SET
  * operations: the overlap of two sketches estimates intersection /
  * Jaccard ([[Kmv.overlap]]).
  */
object Kmv {

  private[functions] def hash60(value: Column): Column =
    conv(substring(md5(value.cast("string")), 1, 15), 16, 10).cast("long")

  /** The sketch: k smallest distinct hashes (TakeOrderedAndProject —
    * per-partition top-k, never a global sort).
    */
  def sketch(df: DataFrame, value: Column, k: Int = 1024): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    // NULL hashes sort FIRST under asc order — an unfiltered null value
    // would occupy (and corrupt) a sketch slot; nulls are not values
    df.select(hash60(value).as("h")).filter(col("h").isNotNull)
      .distinct().orderBy(col("h")).limit(k)
  }

  /** (n_min, h_k, est): est = (k−1)·2⁶⁰ div h_k in decimal(38,0)
    * (≈1.2·10²¹ numerator at k=1024 — past int64, inside decimal), or
    * n_min itself when the input had fewer than k distinct values.
    */
  def estimate(sk: DataFrame, k: Int): DataFrame =
    sk.agg(count(lit(1)).as("n_min"), max(col("h")).as("h_k"))
      .select(col("n_min"), col("h_k"),
        when(col("n_min") < k, col("n_min"))
          .otherwise(expr(
            s"(cast(${k - 1} as decimal(38,0)) * ${1L << 60}) div h_k"))
          .as("est"))

  def distinctEstimate(df: DataFrame, value: Column, k: Int = 1024): DataFrame =
    estimate(sketch(df, value, k), k)

  /** Sketch-based set overlap of two value sets (Beyer et al. 2007):
    * the UNION sketch is the k smallest of the two sketches' union;
    * `c` = how many of its hashes appear in BOTH input sketches;
    * est_inter = (c · est_union) div n, jaccard_bp = (10⁴·c) div n where
    * n = min(|union sketch|, k) — when the union holds FEWER than k
    * hashes the sketch IS the exact union (estimate()'s sub-k path), so
    * dividing by the fixed k would systematically deflate both numbers
    * (two 100-element sets sharing 50 at k=256 would read ≈0.195 Jaccard
    * instead of the exact 1/3). Everything after the two input sketches
    * runs over ≤ 3k rows.
    * Output: (n_a, n_b, est_union, c, est_inter, jaccard_bp).
    */
  def overlap(a0: DataFrame, b0: DataFrame, k: Int): DataFrame = {
    // sketches are ≤ k rows but their LINEAGE is a corpus pass each —
    // eager-checkpoint so the union/mark/size consumers below don't
    // re-run the distinct+top-k three times (Hits/PageRank discipline)
    val a = a0.select(col("h")).localCheckpoint(true)
    val b = b0.select(col("h")).localCheckpoint(true)
    val union = a.unionByName(b)
      .distinct().orderBy(col("h")).limit(k).localCheckpoint(true)
    val marked = union
      .join(a.select(col("h"), lit(1L).as("__ina")), Seq("h"), "left")
      .join(b.select(col("h"), lit(1L).as("__inb")), Seq("h"), "left")
    val uEst = estimate(union, k)
      .select(col("n_min").as("n_u"), col("est").as("est_union"))
    val c = marked.agg(
      sum(when(col("__ina").isNotNull && col("__inb").isNotNull, 1L)
        .otherwise(0L)).as("c"))
    val sizes = a.agg(count(lit(1)).as("n_a"))
      .crossJoin(b.agg(count(lit(1)).as("n_b")))
    sizes.crossJoin(uEst).crossJoin(c)
      // denominator: the union sketch's ACTUAL size when sub-k (exact
      // regime), k otherwise; greatest(…,1) keeps the two-empty-sketches
      // edge at 0 rather than a 0-div NULL
      .select(col("n_a"), col("n_b"), col("est_union"), col("c"),
        expr(s"(c * est_union) div greatest(least(n_u, cast($k as bigint)), 1)")
          .as("est_inter"),
        expr(s"(10000 * c) div greatest(least(n_u, cast($k as bigint)), 1)")
          .as("jaccard_bp"))
  }
}
