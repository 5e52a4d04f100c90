package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global ntile without a global window.
  *
  * `ntile(n) OVER (ORDER BY ...)` plans as `Exchange SinglePartition` +
  * one sort of the ENTIRE table on one task — the classic scale-killer
  * (fine at sf0.1, dead at 100 TB; flagged by VERDICT r2 on q56). This
  * operator produces the identical assignment in two passes, all stages
  * partition-parallel:
  *
  *   1. a deterministic coarse bucketing of the order value (fixed-width
  *      ranges from one min/max aggregate — a pure per-row function, so
  *      re-evaluation across jobs is stable, unlike `spark_partition_id`
  *      after a sampled `repartitionByRange`);
  *   2. per-bucket counts → driver-side cumulative offsets (≤ `coarse`
  *      rows, broadcast back);
  *   3. global rank = bucket offset + `row_number` over a window
  *      PARTITIONED by bucket (largest single sort ≈ N / coarse rows);
  *   4. the rank→tile map is closed-form arithmetic: with N rows and n
  *      tiles, the first N % n tiles carry ⌈N/n⌉ rows — exactly Spark's
  *      and ANSI SQL's NTILE semantics, so output is bit-identical to the
  *      window form (and to DuckDB's NTILE for the oracle).
  *
  * Null order values take the lowest ranks (their own coarse bucket),
  * matching the window form's ascending nulls-first order; `tieBreak`
  * columns must make the total order unique for a deterministic
  * assignment.
  */
object ScalableNtile {

  def ntileByRange(df: DataFrame, nTiles: Int, value: Column,
                   tieBreak: Seq[Column], coarse: Int = 1024): DataFrame = {
    val spark = df.sparkSession
    val b = df.agg(min(value.cast("double")).as("lo"), max(value.cast("double")).as("hi")).head()
    // all-NULL order values: min() is null, but ntile(n) OVER (ORDER BY v)
    // still deals tiles 1..n to the null rows — route every row through
    // the -1 null bucket (any lo/hi works; no row takes the non-null branch)
    val (lo, hi) =
      if (b.isNullAt(0)) (0.0, 0.0) else (b.getDouble(0), b.getDouble(1))
    val width = math.max((hi - lo) / coarse, java.lang.Double.MIN_NORMAL)
    // nulls sort FIRST under the window form's default ascending order —
    // give them their own lowest bucket so ranks (and tiles) match; a
    // null bucket key would NPE the driver-side count collect and be
    // dropped by the offsets join
    val bucket = when(value.isNull, lit(-1L)).otherwise(
      least(greatest(floor((value.cast("double") - lit(lo)) / lit(width)), lit(0L)),
        lit(coarse - 1L)).cast("long"))

    val perBucket = df.groupBy(bucket.as("__cb")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val total = perBucket.map(_._2).sum
    val offsets = perBucket.map(_._1).zip(
      perBucket.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
    val offsetsDf = spark.createDataFrame(offsets.toSeq).toDF("__cb", "__off")

    // ANSI/Spark NTILE: size = N/n, rem = N%n; first `rem` tiles hold size+1
    val size = total / nTiles
    val rem = total % nTiles
    val cut = rem * (size + 1) // ranks 1..cut live in the padded tiles

    val w = Window.partitionBy(col("__cb")).orderBy(value.asc +: tieBreak.map(_.asc): _*)
    df.withColumn("__cb", bucket)
      .join(broadcast(offsetsDf), "__cb")
      .withColumn("__rn", col("__off") + row_number().over(w))
      .withColumn("__graft_ntile",
        // `/` on Columns is floating-point divide; floor() restores the
        // integer division of the NTILE formula (exact for counts < 2^53)
        when(lit(size) === 0L, col("__rn")) // N < nTiles: tile = rank
          .when(col("__rn") <= cut, floor((col("__rn") - 1) / lit(size + 1)) + 1)
          .otherwise(lit(rem) + floor((col("__rn") - 1 - cut) / lit(size)) + 1)
        .cast("int"))
      .drop("__cb", "__off", "__rn")
  }

  /** Per-group ntile without per-group global sorts — the grouped analog
    * of [[ntileByRange]] for `ntile(n) OVER (PARTITION BY g ORDER BY v)`
    * when one group can dominate the table (CCNet-style per-language
    * perplexity buckets: one language may be half the corpus, so the
    * window form's single per-language sort task is the same
    * scale-killer the global form has).
    *
    * Same algorithm, with every driver-side step replaced by
    * distributed plumbing sized to the METADATA, not the data: per-group
    * min/max bounds and per-(group, bucket) counts are tiny aggregates
    * (≤ groups × `coarse` rows) broadcast back; cumulative offsets and
    * group totals come from windows over that tiny counts table; the
    * only sort touching data rows is `row_number` partitioned by
    * (group, coarse-bucket) — largest single sort ≈ N_g / coarse rows.
    * Output is bit-identical to the window form (spec-pinned), with the
    * same nulls-first and unique-total-order requirements.
    *
    * Group keys may be null (null-safe joins throughout) — null groups
    * form their own partition, matching the window form.
    */
  def ntileByRangeGrouped(df: DataFrame, nTiles: Int, value: Column,
                          group: Column, tieBreak: Seq[Column],
                          coarse: Int = 1024): DataFrame = {
    val keyed = df.withColumn("__g", group)
    val bounds = keyed.groupBy(col("__g").as("__gb"))
      .agg(min(value.cast("double")).as("__lo"), max(value.cast("double")).as("__hi"))
    val withBounds = keyed.join(broadcast(bounds), col("__g") <=> col("__gb"))
    val width = greatest((col("__hi") - col("__lo")) / coarse,
      lit(java.lang.Double.MIN_NORMAL))
    // all-null groups have null __lo: every row takes the -1 null bucket
    val bucketed = withBounds.withColumn("__cb",
      when(value.isNull, lit(-1L)).otherwise(
        least(greatest(floor((value.cast("double") - col("__lo")) / width), lit(0L)),
          lit(coarse - 1L)).cast("long")))

    val wOff = Window.partitionBy(col("__gc")).orderBy(col("__cbc").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(col("__gc"))
    val counts = bucketed.groupBy(col("__g").as("__gc"), col("__cb").as("__cbc"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .withColumn("__tot", sum(col("__n")).over(wTot))
      .drop("__n")

    val w = Window.partitionBy(col("__g"), col("__cb"))
      .orderBy(value.asc +: tieBreak.map(_.asc): _*)
    val size = (col("__tot") / nTiles).cast("long") // floor: __tot ≥ 0
    val rem = col("__tot") % nTiles
    val cut = rem * (size + 1)
    bucketed
      .join(broadcast(counts),
        col("__g") <=> col("__gc") && col("__cb") === col("__cbc"))
      .withColumn("__rn", col("__off") + row_number().over(w))
      .withColumn("__graft_ntile",
        when(size === 0L, col("__rn"))
          .when(col("__rn") <= cut, floor((col("__rn") - 1) / (size + 1)) + 1)
          .otherwise(rem + floor((col("__rn") - 1 - cut) / size) + 1)
        .cast("int"))
      .drop("__g", "__gb", "__lo", "__hi", "__cb", "__gc", "__cbc",
        "__off", "__tot", "__rn")
  }
}
