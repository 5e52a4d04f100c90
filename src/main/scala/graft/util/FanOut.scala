package graft.util

import org.apache.spark.sql.DataFrame

/** Input-parallelism floor for provably compute-heavy per-row pipelines
  * (optimization guide §2.5 "input skew" / §2.6 idle capacity).
  *
  * A gate-scale corpus is ONE parquet file with one row group, so every
  * scan-rooted stage runs as ONE task — and a pipeline whose cost is
  * per-row/per-pair compute (md5 shingle hashing, 64-dim cosine folds,
  * image codecs) serializes onto a single core while the other 31 idle.
  * Parquet cannot split a single row group, and AQE's coalescing is a
  * BYTES proxy that re-serializes small-but-expensive shuffled inputs
  * the same way (measured round 13: the margin brute leg, the prefix
  * join's hash pass, and the candidate joins all ran 1-task at sf0.1 —
  * 2.5-3 s stages with 31 idle cores).
  *
  * `FanOut(df)` repartitions up to the session's default parallelism
  * ONLY when the planned partition count is lower — at production scale
  * inputs arrive as many splits and this is a no-op (zero added
  * shuffle), which is what makes it a legitimate scale-adaptive floor
  * rather than a local[32] tune. Apply it where the downstream work per
  * row is heavy; never blanket-apply to cheap scans (the added exchange
  * costs more than it buys there).
  *
  * Only safe where downstream results are partitioning-insensitive
  * (order-insensitive folds, sorted collect_lists, exact per-row maps) —
  * every gate query stays under the DuckDB hash oracle, which is what
  * pins that property.
  */
object FanOut {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // Guard: only probe exchange-free (scan/checkpoint/local-rooted)
    // plans. On those, `.rdd.getNumPartitions` is pure planning — no AQE
    // wrapper, no job. A plan with joins/aggregates/repartitions would
    // EXECUTE its upstream query stages when `.rdd` forces AQE's final
    // plan, so such inputs are returned unchanged (their parallelism is
    // the shuffle layer's business, fixed at the operator with explicit
    // keyed repartitions — see the margin pair joins).
    val hasExchange = df.queryExecution.analyzed.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Join => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Distinct => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Deduplicate => true
      case _: org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Sort => true
      case _: org.apache.spark.sql.catalyst.plans.logical.Window => true
      case _ => false
    }
    if (hasExchange) df
    else if (df.rdd.getNumPartitions < target) df.repartition(target)
    else df
  }
}
