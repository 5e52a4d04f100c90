package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental maintenance of grouped sum/count aggregates from a
  * [[graft.sink.TxTable]] change feed — refresh a derived table from the
  * rows that CHANGED, never by rescanning the base (reference behavior:
  * the pipeline's derived summary tables are recomputed per run from the
  * full lake, datalakeingestion utils/merge_data_utils.py; at 100 TB a
  * full-recompute refresh is a full-table pass per refresh, while this
  * costs the day's changed files + one shuffle over the delta keys).
  *
  * Classic algebraic IVM (Gupta & Mumick, "Maintenance of Materialized
  * Views: Problems, Techniques, and Applications", IEEE DE Bulletin 1995):
  * sum and count are self-maintainable under insert AND delete — apply
  * the feed with sign (+row for `insert`, −row for `delete`), add per
  * group, drop groups whose maintained count reaches zero (group death),
  * surface new keys from the delta side (group birth). An update from
  * [[graft.sink.TxTable.merge]] arrives as delete(old)+insert(new), so
  * it nets to exactly the value movement. `avg` derives as sum/count at
  * read time. min/max are deliberately NOT offered: they are not
  * self-maintainable under deletes (a deleted extremum needs a re-scan of
  * its group) — callers needing them should recompute the affected groups
  * via a stats-pruned semi-join read, not silently get a wrong answer.
  *
  * Scale shape: the feed read is bounded by the version diff's files
  * ([[graft.sink.TxTable.readChanges]]); [[deltas]] is one partial-agg
  * shuffle over feed rows carrying only (keys, signed sums); [[applied]]
  * is one join keyed on the group key between the derived table (small —
  * it is an aggregate) and the delta table (bounded by the feed). Spark
  * broadcasts whichever side is small; neither is ever the base table.
  */
object IncrementalView {

  /** Per-key signed deltas from a change feed: for each `sumCols` column
    * `c` a net movement `c`, plus a net row-count movement `cntCol`.
    * Inserts count +, deletes −; a key whose changes cancel exactly still
    * yields a zero-delta row (harmless — [[applied]] adds zero).
    */
  def deltas(changes: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
             cntCol: String = "n_rows"): DataFrame = {
    require(keyCols.nonEmpty, "at least one group key")
    val sign = when(col("_change_type") === "insert", lit(1L))
      .when(col("_change_type") === "delete", lit(-1L))
      .otherwise(raise_error(concat(lit("unknown _change_type: "),
        col("_change_type"))))
    changes.groupBy(keyCols.map(col): _*)
      .agg(sum(sign).as(cntCol),
        sumCols.map(c => sum(sign * col(c)).as(c)): _*)
  }

  /** Apply [[deltas]] to the current derived state. Null-safe key match
    * (a NULL group key is a real group under SQL GROUP BY), full outer so
    * both group birth (delta-only key) and group death (count reaches 0)
    * resolve. Requires `derived` to carry exactly keyCols ++ sumCols ++
    * cntCol — i.e. it was produced by the same aggregate this maintains.
    */
  def applied(derived: DataFrame, deltaDf: DataFrame,
              keyCols: Seq[String], sumCols: Seq[String],
              cntCol: String = "n_rows"): DataFrame = {
    val expected = (keyCols ++ sumCols :+ cntCol).toSet
    require(derived.columns.toSet == expected,
      s"derived must carry exactly $expected, got ${derived.columns.toSet}")
    val d = derived.alias("d")
    val x = deltaDf.alias("x")
    val on = keyCols.map(k => col(s"d.$k") <=> col(s"x.$k")).reduce(_ && _)
    val keyOut = keyCols.map(k => coalesce(col(s"d.$k"), col(s"x.$k")).as(k))
    // column order mirrors [[compute]] so refresh-vs-recompute parity is
    // a positional exceptAll
    val valOut = (cntCol +: sumCols).map(c =>
      (coalesce(col(s"d.$c"), lit(0L)) + coalesce(col(s"x.$c"), lit(0L))).as(c))
    d.join(x, on, "full_outer")
      .select(keyOut ++ valOut: _*)
      .filter(col(cntCol) > 0)
  }

  /** One-call refresh: derived state at `fromVersion` → derived state at
    * `toVersion`, reading only the base table's changed files.
    */
  def refresh(spark: SparkSession, baseTable: String, derived: DataFrame,
              fromVersion: Long, toVersion: Long,
              keyCols: Seq[String], sumCols: Seq[String],
              cntCol: String = "n_rows"): DataFrame = {
    val feed = graft.sink.TxTable.readChanges(spark, baseTable, fromVersion, toVersion)
    applied(derived, deltas(feed, keyCols, sumCols, cntCol), keyCols, sumCols, cntCol)
  }

  /** The aggregate this module maintains, for bootstrapping the derived
    * table and for parity checks: groupBy(keys).agg(count, sum(sumCols)).
    */
  def compute(base: DataFrame, keyCols: Seq[String], sumCols: Seq[String],
              cntCol: String = "n_rows"): DataFrame =
    base.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(cntCol),
        sumCols.map(c => sum(col(c)).as(c)): _*)
}
