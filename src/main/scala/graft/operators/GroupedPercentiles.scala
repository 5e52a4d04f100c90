package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group discrete percentiles without a per-group global sort.
  *
  * `percentile_disc(p) WITHIN GROUP (ORDER BY v) ... GROUP BY g` (and
  * Spark's `percentile(v, p)` family) plans each group's ORDER BY as one
  * sort task — a dominant group (one language as half the corpus) is the
  * same scale-killer [[ScalableNtile]] exists for. This computes the
  * identical answer by rank selection over a coarse histogram:
  *
  *   1. range-bucket each row's value per group (one tiny per-group
  *      min/max aggregate, broadcast back — [[ScalableNtile]]'s step);
  *   2. per-(group, bucket) counts → cumulative offsets and group totals
  *      via windows over the counts table (≤ groups × `coarse` rows);
  *   3. for each requested percentile, the target rank is exact integer
  *      arithmetic — `max(1, ceil(p·n))` computed as
  *      `(bp·n + 9999) div 10000` on longs, never a float — and the ONE
  *      bucket containing that rank is found by joining the percentile
  *      list against the counts table (`off < rank ≤ off + n`);
  *   4. only rows of selected buckets are sorted (a `row_number` window
  *      per (group, bucket, percentile) — largest sort ≈ N_g/`coarse`),
  *      and the row at the bucket-local rank is the answer. The value at
  *      a given rank is well-defined under ties (equal values are
  *      interchangeable), so no tie-break column is needed.
  *
  * ANSI `PERCENTILE_DISC` semantics: the smallest value whose cumulative
  * ascending rank reaches `ceil(p·n)`; `p = 0` clamps to the minimum,
  * `p = 1` is the maximum. NULL values are ignored (standard aggregate
  * behavior); a group whose values are ALL null still surfaces, with a
  * null percentile value, like the SQL aggregate over its group would.
  *
  * Percentiles are passed in basis points (2500 = p25) so the rank
  * formula is engine-portable integer arithmetic — a float `ceil(p*n)`
  * diverges between engines exactly at the rank boundaries.
  */
object GroupedPercentiles {

  /** One output row per (group, percentile): `(g, p_bp, v)` where `v`
    * keeps the value column's type. `pBp` are basis points in [0, 10000].
    */
  def percentilesByRange(df: DataFrame, value: Column, group: Column,
                         pBp: Seq[Int], coarse: Int = 1024): DataFrame = {
    require(pBp.nonEmpty, "at least one percentile")
    require(pBp.forall(p => p >= 0 && p <= 10000),
      s"percentiles are basis points in [0, 10000], got $pBp")
    require(pBp.distinct.size == pBp.size, s"duplicate percentiles: $pBp")
    val spark = df.sparkSession
    import spark.implicits._

    val keyed = df.select(group.as("__g"), value.as("__v"))
    val nn = keyed.filter(col("__v").isNotNull)
    val bounds = nn.groupBy(col("__g").as("__gb"))
      .agg(min(col("__v").cast("double")).as("__lo"),
        max(col("__v").cast("double")).as("__hi"))
    val width = greatest((col("__hi") - col("__lo")) / coarse,
      lit(java.lang.Double.MIN_NORMAL))
    val bucketed = nn.join(broadcast(bounds), col("__g") <=> col("__gb"))
      .withColumn("__cb",
        least(greatest(floor((col("__v").cast("double") - col("__lo")) / width),
          lit(0L)), lit(coarse - 1L)).cast("long"))
      .drop("__gb", "__lo", "__hi")

    val wOff = Window.partitionBy(col("__gc")).orderBy(col("__cbc").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("__gc"))
    val counts = bucketed.groupBy(col("__g").as("__gc"), col("__cb").as("__cbc"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .withColumn("__tot", sum(col("__n")).over(wTot))

    // rank = max(1, ceil(bp·tot / 10000)) in exact longs — `div`, not
    // floor(/): double division loses exactness past 2^53 and bp·tot
    // reaches 1e16 at trillion-row groups
    val pDf = pBp.toDF("__p")
    val rank = greatest(lit(1L),
      expr("(CAST(__p AS BIGINT) * __tot + 9999L) div 10000L"))
    val targets = counts.join(broadcast(pDf),
        rank > col("__off") && rank <= col("__off") + col("__n"))
      .select(col("__gc"), col("__cbc"), col("__p"),
        (rank - col("__off")).as("__lr"))

    // only selected buckets reach the sort; a bucket feeding k
    // percentiles is numbered once per percentile (window keyed by __p)
    val w = Window.partitionBy(col("__g"), col("__cb"), col("__p"))
      .orderBy(col("__v").asc)
    val picked = bucketed
      .join(broadcast(targets),
        col("__g") <=> col("__gc") && col("__cb") === col("__cbc"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === col("__lr"))
      .select(col("__g"), col("__p"), col("__v"))

    // groups whose values are all NULL: present in the input, absent
    // from the non-null side — surface with a null value per percentile
    val allNull = keyed.select(col("__g")).distinct()
      .join(nn.select(col("__g")).distinct(), Seq("__g"), "left_anti")
      .crossJoin(broadcast(pDf))
      .withColumn("__v", lit(null).cast(picked.schema("__v").dataType))
      .select(col("__g"), col("__p"), col("__v"))

    picked.unionByName(allNull)
      .withColumnsRenamed(Map("__g" -> "g", "__p" -> "p_bp", "__v" -> "v"))
  }

  /** Per-group winsorization: clamp `value` into its group's
    * [`loBp`, `hiBp`] percentile band (outlier clipping before
    * aggregates/features — the curation move for heavy-tailed signals
    * like document length, where a handful of megadocs would dominate a
    * mean or a token budget). Returns the input plus `clampCol`; the
    * percentile table is tiny (groups × 2) and broadcast back, so the
    * cost over a plain scan is [[percentilesByRange]] + one map. Rows
    * with a null value (or an all-null group) keep null in `clampCol`.
    */
  def winsorize(df: DataFrame, value: Column, group: Column,
                loBp: Int, hiBp: Int, clampCol: String,
                coarse: Int = 1024): DataFrame = {
    require(loBp < hiBp, s"loBp $loBp must be < hiBp $hiBp")
    val cuts = percentilesByRange(df, value, group, Seq(loBp, hiBp), coarse)
      .groupBy(col("g").as("__wg"))
      .agg(min(when(col("p_bp") === loBp, col("v"))).as("__wlo"),
        min(when(col("p_bp") === hiBp, col("v"))).as("__whi"))
    df.join(broadcast(cuts), group <=> col("__wg"), "left")
      // least/greatest SKIP nulls (they are not null-strict): a null
      // value would otherwise "clamp" to the band edge instead of
      // staying null — guard explicitly
      .withColumn(clampCol, when(value.isNull, lit(null))
        .otherwise(greatest(col("__wlo"), least(col("__whi"), value))))
      .drop("__wg", "__wlo", "__whi")
  }

  /** Per-group robust outlier flagging by Median Absolute Deviation:
    * a row is an outlier when `|value − median| > k · MAD`, where MAD is
    * the median of the group's absolute deviations — the robust
    * dispersion measure (50% breakdown point) that a z-score filter
    * lacks: one megadoc inflates a group's stddev enough to hide itself,
    * but cannot move its median or MAD (reference behavior: the
    * pipeline carries no outlier guard at all — validation_utils.py
    * checks counts only — so a corrupt feed's length spike flows
    * straight to the lake).
    *
    * Returns the input plus `medCol`, `madCol` and `flagCol` (boolean).
    * Both medians are exact PERCENTILE_DISC by [[percentilesByRange]]'s
    * rank selection — two coarse-histogram passes, never a per-group
    * global sort — and for integral `value` every derived quantity is
    * exact integer arithmetic (`k · MAD` included), so the flag is
    * engine-portable bit-for-bit. The per-group (median, MAD) table is
    * tiny and broadcast back. Null values keep null med/mad/flag.
    *
    * Textbook MAD degeneracy, kept deliberately: when over half the
    * group shares one value, MAD = 0 and EVERY deviating row is flagged
    * — for corpus curation that reads "in a group this concentrated,
    * any deviation is anomalous", and callers wanting slack can filter
    * on `madCol > 0`.
    */
  def madOutliers(df: DataFrame, value: Column, group: Column, k: Int,
                  medCol: String, madCol: String, flagCol: String,
                  coarse: Int = 1024): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val med = percentilesByRange(df, value, group, Seq(5000), coarse)
      .select(col("g").as("__mg"), col("v").as("__med"))
    val withMed = df.join(broadcast(med), group <=> col("__mg"), "left")
      .withColumn("__dev", abs(value - col("__med")))
    val mad = percentilesByRange(withMed, col("__dev"), group, Seq(5000), coarse)
      .select(col("g").as("__ag"), col("v").as("__mad"))
    withMed.join(broadcast(mad), group <=> col("__ag"), "left")
      .withColumn(medCol, col("__med"))
      .withColumn(madCol, col("__mad"))
      .withColumn(flagCol, when(value.isNull, lit(null).cast("boolean"))
        .otherwise(col("__dev") > lit(k) * col("__mad")))
      .drop("__mg", "__med", "__dev", "__ag", "__mad")
  }
}
