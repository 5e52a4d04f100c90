package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-grid resampling with last-observation-carried-forward — the
  * gap-fill that turns an irregular event stream into the regular
  * per-key time series every downstream feature/training pipeline
  * assumes (metric grids, sensor series, price marks). The reference
  * engine resamples nothing; this is a beyond-§2 time-series operator
  * next to the rolling window (q106) and as-of join (q36).
  *
  * Semantics: for each key, one row per grid step from its first to its
  * last observed step; the value at step h is the LAST observation with
  * step ≤ h (ties within a step broken by the highest (ts, tie) pair —
  * deterministic for any unique tie column). `is_obs` marks steps that
  * had a real observation vs carried ones.
  *
  * 100 TB shape: everything is keyed by `key` — per-step argmax
  * (partial-aggregating shuffle), per-key bounds, the grid explode, one
  * co-keyed left join, one ordered window. AQE coalesces the chain; on
  * a real cluster, one repartition(key) up front serves every stage.
  * The grid explode is the blowup hazard (a key spanning years at
  * minute granularity), so `maxSteps` is a loud-failure tripwire, same
  * discipline as RangeJoin's bucket cap: raise the step size, don't
  * discover the 10M-row key in an executor OOM.
  */
object GapFill {

  /** LOCF-filled grid: (key, step, filled, is_obs). `ts` must be an
    * epoch-µs long column; `stepUs` the grid size in µs; `tie` any
    * unique column making the within-step argmax deterministic.
    */
  def locf(events: DataFrame, key: Column, ts: Column, tie: Column,
           value: Column, stepUs: Long, maxSteps: Long = 1L << 20): DataFrame = {
    require(stepUs > 0, s"stepUs must be positive, got $stepUs")
    val obs = events
      .select(key.as("key"), ts.as("__us"), tie.as("__tie"), value.as("__v"))
      .filter(col("key").isNotNull && col("__us").isNotNull)
      .withColumn("step", expr(s"__us div $stepUs"))
      // last observation inside each step, deterministically
      .groupBy(col("key"), col("step"))
      .agg(max_by(col("__v"), struct(col("__us"), col("__tie"))).as("obs_v"))
    // the cap check rides INSIDE the column `sequence` consumes — a
    // free-standing checked column gets pruned by Catalyst and the
    // tripwire silently vanishes (spec-pinned)
    val hiChecked = when(col("__hi") - col("__lo") < maxSteps, col("__hi"))
      .otherwise(raise_error(format_string(
        s"GapFill.locf: key %s spans %d grid steps at stepUs=$stepUs " +
          s"(cap $maxSteps) — coarsen the step or split the key",
        col("key").cast("string"), col("__hi") - col("__lo") + 1)).cast("long"))
    val grid = obs.groupBy(col("key"))
      .agg(min(col("step")).as("__lo"), max(col("step")).as("__hi"))
      .select(col("key"), explode(sequence(col("__lo"), hiChecked)).as("step"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("step"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "step"), "left")
      .withColumn("filled", last(col("obs_v"), ignoreNulls = true).over(w))
      .withColumn("is_obs", col("obs_v").isNotNull)
      .select(col("key"), col("step"), col("filled"), col("is_obs"))
  }
}
