package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix budget allocation by water-filling: given per-source
  * token counts and a total token budget B, find per-source sampling
  * rates that get every source as close to the equal share `B/m` as its
  * own volume allows — small sources contribute EVERYTHING (rate 1),
  * and their shortfall redistributes across the larger sources (the
  * DoReMi/data-mixture problem's feasibility core, solved exactly
  * rather than iterated).
  *
  * The classic closed form replaces the iterative loop: sort sources by
  * token count ascending; source i (1-based, m total) saturates iff
  * `t_i · (m − i + 1) ≤ B − prefix_i` (its count can't reach the fair
  * share of the budget left after every smaller source contributed
  * fully — saturation is prefix-closed, so ONE window pass decides all
  * of them); the survivors split the remaining budget evenly. All
  * decisions are exact integer comparisons; rates are exact ppm floor
  * divisions.
  *
  * Shape: one corpus aggregate → every window runs over the |sources|
  * row grid (tens, never the corpus) — the [[Raking]] discipline.
  */
object MixPlanner {

  /** (source, tokens, saturated, rate_ppm, planned_tokens) for budget
    * `B = total · budgetNum / budgetDen` (exact integer budget).
    */
  def waterfill(df: DataFrame, source: Column, tokensPerRow: Column,
                budgetNum: Long = 1L, budgetDen: Long = 2L): DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, "budget must be a nonneg rational")
    // |sources|-row table, but its LINEAGE is a full-corpus token-count
    // pass consumed by the ranking AND the totals broadcast — eager-
    // checkpoint so the corpus aggregates once (cross-branch audit)
    val per = df.groupBy(source.as("source"))
      .agg(sum(tokensPerRow.cast("long")).as("tokens"))
      .localCheckpoint(true)
    val wOrd = Window.orderBy(col("tokens").asc, col("source").asc)
    val ranked = per
      .withColumn("__i", row_number().over(wOrd).cast("long"))
      .withColumn("__prefix",
        coalesce(sum(col("tokens")).over(
          wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .crossJoin(broadcast(per.agg(
        sum(col("tokens")).as("__t"), count(lit(1)).as("__m"))))
      .withColumn("__b", expr(s"__t * $budgetNum div $budgetDen"))
      .withColumn("saturated",
        col("tokens") * (col("__m") - col("__i") + 1L) <= col("__b") - col("__prefix"))
    val satAgg = ranked.agg(
      sum(when(col("saturated"), col("tokens")).otherwise(0L)).as("__sat_t"),
      sum(when(col("saturated"), 1L).otherwise(0L)).as("__sat_m"))
    ranked.crossJoin(broadcast(satAgg))
      .withColumn("__fair",
        when(col("__m") > col("__sat_m"),
          expr("(__b - __sat_t) div (__m - __sat_m)")).otherwise(lit(0L)))
      .withColumn("rate_ppm",
        when(col("saturated"), lit(1000000L))
          .otherwise(least(lit(1000000L), expr("__fair * 1000000 div tokens"))))
      .withColumn("planned_tokens", expr("tokens * rate_ppm div 1000000"))
      .select(col("source"), col("tokens"), col("saturated"),
        col("rate_ppm"), col("planned_tokens"))
  }
}
