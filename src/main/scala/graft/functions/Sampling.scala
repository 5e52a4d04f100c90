package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling & curation for training-data pipelines.
  *
  * Everything is CONTENT-hash driven, never RNG: a sample must be stable
  * across reruns, partitionings, cluster sizes, and engines (the same
  * md5-prefix arithmetic as [[TextFunctions.hashSplit]]), or downstream
  * training runs aren't reproducible and holdout contamination can't be
  * audited. All operators are per-row projections + one partitioned
  * window at most — no global sorts, no driver state; shapes hold at
  * 100 TB.
  */
object Sampling {

  /** Stable 0..9999 bucket from content (basis points → 0.01% rate
    * granularity). Engine-portable: any SQL dialect reproduces it.
    */
  def hashBucketBp(key: Column): Column =
    conv(substring(md5(key), 1, 8), 16, 10).cast("long") % 10000

  /** Deterministic Bernoulli sample at `rateBp` basis points (5000 =
    * 50%). Same content → same verdict, everywhere, forever.
    */
  def hashSample(df: DataFrame, key: Column, rateBp: Int): DataFrame =
    df.filter(hashBucketBp(key) < rateBp)

  /** Stratified deterministic sample: per-stratum rates in basis points
    * (the down-sample-the-head / up-weight-the-tail move of corpus
    * balancing), unknown strata fall back to `defaultBp`.
    */
  def stratifiedSample(df: DataFrame, stratum: Column, key: Column,
                       ratesBp: Map[String, Int], defaultBp: Int): DataFrame = {
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, bp)) =>
      when(stratum === s, lit(bp)).otherwise(acc)
    }
    df.filter(hashBucketBp(key) < rate)
  }

  /** Token-budget curation: per stratum, greedily keep the largest
    * documents (ties → lowest id) until the cumulative token count
    * exceeds `budget`. One partitioned-window pass; integer arithmetic
    * only, so the kept set is engine-exact.
    */
  def tokenBudget(df: DataFrame, stratum: Column, tokens: Column, id: Column,
                  budget: Long): DataFrame = {
    val w = Window.partitionBy(stratum).orderBy(tokens.desc, id.asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("__cum", sum(tokens.cast("long")).over(w))
      .filter(col("__cum") <= budget)
      .drop("__cum")
  }
}
