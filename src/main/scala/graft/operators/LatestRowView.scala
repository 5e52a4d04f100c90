package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  private val RowNum = "__graft_row_num"

  /** One row per `keys`, the one with the greatest `ordering` columns.
    * Pass extra tie-break columns (e.g. a unique id) for determinism —
    * the reference leaves ties unhandled (SURVEY.md §7.4).
    */
  def latestPerKey(df: DataFrame, keys: Seq[String], ordering: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ordering.map(_.desc): _*)
    df.withColumn(RowNum, row_number().over(w))
      .filter(col(RowNum) === 1)
      .drop(RowNum)
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
