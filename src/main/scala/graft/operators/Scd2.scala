package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) builder: collapse a change log
  * into validity intervals.
  *
  * The reference materializes "current state" only (its latest-row view,
  * common_utils.py latest-state recovery); warehouses additionally need
  * the HISTORY form — one row per (key, consecutive run of an unchanged
  * value) with `valid_from`/`valid_to` bounds, `valid_to IS NULL`
  * marking the open current version. This is the classic gaps-and-islands
  * plan, kept fully declarative so Catalyst pipelines all three windows
  * over ONE hash partitioning by key:
  *
  *   1. change flag  — value differs from its predecessor (null-safe),
  *   2. island id    — running sum of flags,
  *   3. interval     — group by (key, island): `valid_from = min(ts)`,
  *                     `valid_to = lead(valid_from)` over islands.
  *
  * Scale shape: one shuffle on the key, windows and the aggregate all
  * reuse it (verified: a single Exchange in the plan). Per-key history
  * length bounds the window sort, not corpus size. No driver state.
  */
object Scd2 {

  /** @param key   dimension identity (the SCD "natural key")
    * @param ts    event/change time — interval bounds come from it
    * @param tie   deterministic order within equal `ts` (e.g. a pk)
    * @param value the tracked attribute; consecutive equal values merge
    */
  def intervals(df: DataFrame, key: Column, ts: Column, tie: Column,
                value: Column): DataFrame = {
    val byKey = Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))
    val run = Window.partitionBy(col("k")).orderBy(col("ts"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val byIsland = Window.partitionBy(col("k")).orderBy(col("island"))
    df.select(key.as("k"), ts.as("ts"), tie.as("tie"), value.as("v"))
      // row 1 always opens an island; <=> keeps null values mergeable
      // (a run of NULLs is one island, not one island per row)
      .withColumn("chg",
        when(row_number().over(byKey) === 1, 1)
          .when(not(col("v") <=> lag(col("v"), 1).over(byKey)), 1)
          .otherwise(0))
      .withColumn("island", sum(col("chg")).over(run))
      .groupBy(col("k"), col("island"))
      .agg(first(col("v")).as("value"), min(col("ts")).as("valid_from"),
        count(lit(1)).as("n_rows"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byIsland))
      .drop("island")
  }
}
