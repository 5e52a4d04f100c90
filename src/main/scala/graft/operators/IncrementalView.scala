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

  // ------------------------------------------------------ join views

  /** Signed change feed of the equi-join `R ⋈ S` when BOTH sides change —
    * the classic delta rule (Gupta & Mumick 1995, §join views), in the
    * form that avoids reading the OLD dimension state:
    *
    *   Δ(R ⋈ S) = (ΔR ⋈ S_new) ⊎ (R_old ⋈ ΔS)
    *
    * (expand `S_new = S_old ⊎ ΔS` to recover the textbook three-term
    * rule — the `ΔR ⋈ ΔS` cross term folds into the first join). Each
    * output row keeps the `_change_type` sign of the DELTA side that
    * produced it: a dimension update (delete old row + insert new row
    * from [[graft.sink.TxTable.merge]]) therefore moves every joining
    * fact row out of the old attribute value and into the new one, and
    * the ⊎ is a plain multiset union — signs never multiply in this
    * form because each term carries exactly one delta input.
    *
    * Scale shape: ΔR and ΔS read bounded file diffs
    * ([[graft.sink.TxTable.readChanges]]); `S_new` is the dimension head
    * (small by definition of a dim — Spark broadcasts it); `R_old ⋈ ΔS`
    * is the one term that touches historical fact data, and its input
    * should be [[graft.sink.TxTable.readAtOverlapping]] — the old fact
    * files whose committed join-key range overlaps the changed dim keys,
    * NOT a full historical scan (pass it as `rOld`). Either side may be
    * empty: no dim changes ⇒ the fact-only rule, no fact changes ⇒ the
    * dim-only rule, and the caller can skip building `rOld` entirely
    * when ΔS is empty.
    *
    * Null join keys never join (SQL inner-equi-join semantics), so rows
    * with a null `joinKey` are invisible to the view on both the
    * recompute and the incremental path — consistently. Non-key column
    * names must be disjoint between the two sides (the join output must
    * be unambiguous); rename before calling.
    */
  def joinFeed(changesR: DataFrame, sHead: DataFrame,
               rOld: DataFrame, changesS: DataFrame,
               joinKey: String): DataFrame = {
    val ct = "_change_type"
    require(changesR.columns.contains(ct) && changesS.columns.contains(ct),
      s"changesR/changesS must be change feeds carrying $ct")
    require(!sHead.columns.contains(ct) && !rOld.columns.contains(ct),
      s"sHead/rOld are STATES, not feeds — they must not carry $ct")
    val rCols = changesR.columns.filterNot(c => c == joinKey || c == ct)
    val sCols = changesS.columns.filterNot(c => c == joinKey || c == ct)
    val overlap = rCols.toSet intersect sCols.toSet
    require(overlap.isEmpty,
      s"non-key columns must be disjoint across the join, both have $overlap")
    val out = (joinKey +: (rCols ++ sCols) :+ ct).map(col(_))
    changesR.join(sHead, Seq(joinKey)).select(out: _*)
      .unionByName(rOld.join(changesS, Seq(joinKey)).select(out: _*))
  }

  /** The aggregate [[refreshJoin]] maintains, for bootstrapping and
    * parity checks: `R ⋈ S` on `joinKey`, then [[compute]]'s aggregate.
    */
  def computeJoin(r: DataFrame, s: DataFrame, joinKey: String,
                  keyCols: Seq[String], sumCols: Seq[String],
                  cntCol: String = "n_rows"): DataFrame =
    compute(r.join(s, Seq(joinKey)), keyCols, sumCols, cntCol)

  /** One-call refresh of a grouped sum/count view over `R ⋈ S`: derived
    * state at (`rFrom`, `sFrom`) → derived state at (`rTo`, `sTo`),
    * reading only (a) both tables' changed files and (b) — only when the
    * dimension actually changed — the OLD fact files whose committed
    * `joinKey` stats overlap the changed dimension keys (stats-pruned
    * time travel, never a full historical scan).
    */
  def refreshJoin(spark: SparkSession, rTable: String, sTable: String,
                  derived: DataFrame, rFrom: Long, rTo: Long,
                  sFrom: Long, sTo: Long, joinKey: String,
                  keyCols: Seq[String], sumCols: Seq[String],
                  cntCol: String = "n_rows"): DataFrame = {
    import graft.sink.TxTable
    val changesR = TxTable.readChanges(spark, rTable, rFrom, rTo)
    val changesS = TxTable.readChanges(spark, sTable, sFrom, sTo)
    val sHead = TxTable.readAt(spark, sTable, sTo)
    val rOld =
      if (changesS.isEmpty) changesR.drop("_change_type").limit(0)
      else TxTable.readAtOverlapping(spark, rTable, rFrom, joinKey,
        changesS.select(joinKey))
    val feed = joinFeed(changesR, sHead, rOld, changesS, joinKey)
    applied(derived, deltas(feed, keyCols, sumCols, cntCol),
      keyCols, sumCols, cntCol)
  }
}
