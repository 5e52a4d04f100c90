package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level diff of two table snapshots by key — the audit half of the
  * lakehouse spine: TxTable's change feed (q119) answers "what did MY
  * commits change"; this answers "how do these two states differ" for
  * ANY pair of tables (two versions, two replicas, lake vs source), the
  * reconciliation the reference approximates with row counts only
  * (utils/audit_utils.py count validation — SURVEY.md §2.4 J3 / §2.5 A3
  * go no deeper than count equality).
  *
  * 100 TB shape: each side is reduced map-side to (key, md5-of-values)
  * before anything shuffles — one 128-bit digest per row moves, not the
  * row — then ONE full-outer hash join on the key decides
  * added / removed / changed, and unchanged rows (the overwhelming
  * majority in practice) are dropped inside the same stage. No window,
  * no sort, no collect; skewless because the key is the table's own
  * primary key.
  */
object SnapshotDiff {

  /** Keys present only in `b` → added; only in `a` → removed; in both
    * with different non-key values → changed. Unchanged keys are not
    * returned. Both sides must share the schema; value comparison is an
    * md5 over null-sentineled string-normalized values, so NULL ≠ "" and
    * a NULL column never collides with a missing one.
    */
  def diff(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(a.columns.sameElements(b.columns),
      s"schema mismatch: ${a.columns.mkString(",")} vs ${b.columns.mkString(",")}")
    val valCols = a.columns.filterNot(keys.contains)
    require(valCols.nonEmpty, "diff needs at least one non-key column")
    def digested(df: DataFrame, tag: String) = df.select(
      keys.map(col) :+
        md5(concat_ws("\u0001",
          valCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(s"__h_$tag"): _*)
    digested(a, "a").join(digested(b, "b"), keys, "full_outer")
      .withColumn("status",
        when(col("__h_a").isNull, lit("added"))
          .when(col("__h_b").isNull, lit("removed"))
          .when(col("__h_a") =!= col("__h_b"), lit("changed")))
      .filter(col("status").isNotNull)
      .select(keys.map(col) :+ col("status"): _*)
  }
}
