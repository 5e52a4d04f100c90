package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** "Latest version of each row" over an append-only lake — the reference
  * emits an Athena view `row_number() OVER (PARTITION BY pk ORDER BY delta
  * DESC) = 1` (reference: start_ingestion.py:361-374; SURVEY.md §2.6 W1).
  *
  * Scale note: this is a single hash-partition shuffle on the primary key
  * followed by a per-partition sort — the canonical Spark plan. At 100 TB
  * the shuffle is unavoidable for a global answer; AQE coalesces the
  * post-shuffle partitions. When the lake is bucketed by `pk`
  * (`DataFrameWriter.bucketBy`), Catalyst elides the exchange entirely.
  */
object LatestRowView {

  /** One row per `keys`, the one with the greatest `ordering` columns.
    * Pass extra tie-break columns (e.g. a unique id) for determinism —
    * the reference leaves ties unhandled (SURVEY.md §7.4).
    *
    * Implemented as `max_by(struct(*), struct(ordering))` — a hash
    * aggregate, not a window: partial aggregation collapses each map
    * partition to one candidate row per key BEFORE the shuffle, and no
    * per-key sort happens at all. On an append-heavy lake where each key
    * has many versions this shuffles ~|keys| rows instead of |rows| and
    * beats the row_number() plan by the ratio of versions per key.
    * (The row_number form of the reference's view DDL is kept in
    * viewDdl for SQL consumers — same semantics.)
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keys.map(col): _*)
      .agg(max_by(payload, struct(ordering: _*)).as("__row"))
      .select(col("__row.*"))
  }

  /** Register the latest-row view in the session catalog — the Spark
    * equivalent of the reference's `CREATE OR REPLACE VIEW …_lv` DDL
    * (start_ingestion.py:333-384), with the catalog replacing Glue.
    */
  def createView(df: DataFrame, keys: Seq[String], ordering: Seq[Column], viewName: String): Unit =
    latestPerKey(df, keys, ordering).createOrReplaceTempView(viewName)

  /** The generated SQL text, for engines that consume DDL (golden-tested;
    * mirrors start_ingestion.py:361-374's string shape).
    */
  def viewDdl(viewDb: String, viewName: String, srcDb: String, srcTable: String,
              pkeyCols: Seq[String], deltaCol: String): String = {
    val pk = pkeyCols.mkString(", ")
    s"""CREATE OR REPLACE VIEW $viewDb.$viewName AS
       |SELECT * FROM (
       |  SELECT *, row_number() OVER (PARTITION BY $pk ORDER BY $deltaCol DESC) AS row_num
       |  FROM $srcDb.$srcTable
       |) WHERE row_num = 1""".stripMargin
  }
}
