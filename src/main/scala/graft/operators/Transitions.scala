package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** First-order Markov transition matrix over per-key ordered event
  * streams — the classic product-analytics "what happens after X"
  * operator (next-event prediction baselines, funnel discovery,
  * session-path mining).
  *
  * Shape: ONE shuffle on the stream key for the lag window (state per
  * task is a single previous row — the window frame is
  * `rowsBetween(-1, -1)`, never the whole partition materialized), then
  * a partial-agg'd groupBy over the tiny (from, to) state-pair domain.
  * Probabilities are exact ppm integers (`n · 10^6 div n_from`), so the
  * matrix replays bit for bit on any engine.
  *
  * At 100 TB the only hazard is a single hot key (one user with
  * millions of events serializes one task); the key cardinality itself
  * (users) scales the work evenly — no global sort, no corpus window.
  */
object Transitions {

  /** (from_state, to_state, n, p_ppm): consecutive state pairs per key,
    * ordered by `order` columns (caller supplies a TOTAL order — ties
    * would make "consecutive" nondeterministic).
    */
  def matrix(df: DataFrame, key: Column, state: Column,
             order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key).orderBy(order: _*)
    val pairs = df
      .withColumn("__from", lag(state, 1).over(w))
      .filter(col("__from").isNotNull)
      .select(col("__from").as("from_state"), state.as("to_state"))
    val counts = pairs.groupBy(col("from_state"), col("to_state"))
      .agg(count(lit(1)).as("n"))
    val fromTotals = counts.groupBy(col("from_state"))
      .agg(sum(col("n")).as("n_from"))
    counts.join(broadcast(fromTotals), "from_state")
      .withColumn("p_ppm", expr("n * 1000000 div n_from"))
      .select(col("from_state"), col("to_state"), col("n"), col("p_ppm"))
  }
}
