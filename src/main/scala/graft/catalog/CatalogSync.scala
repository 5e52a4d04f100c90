package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Catalog maintenance over the written lake — the Spark-native
  * replacement for the reference's Glue-crawler + Athena machinery
  * (SURVEY.md §2.2 K6, §2.1 S7): no polling state machine, the catalog
  * lives in the SparkSession and registration is synchronous.
  */
object CatalogSync {

  /** Register a lake path as a queryable table. Partition columns are
    * discovered from the Hive-style directory layout by the file index —
    * the crawler's whole job (aws_utils.py:42-109) collapses into this.
    */
  def registerTable(spark: SparkSession, name: String, path: String): Unit =
    spark.read.parquet(path).createOrReplaceTempView(name)

  /** Re-scan a registered table's files (crawler "refresh" semantics). */
  def refresh(spark: SparkSession, name: String): Unit =
    spark.catalog.refreshTable(name)

  /** Run lake SQL (S7: the Athena query path becomes spark.sql — Spark
    * IS the lake SQL engine; `ctas_approach`/polling disappear).
    */
  def query(spark: SparkSession, sql: String): DataFrame = spark.sql(sql)
}
