package graft.sink

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) data layout: interleave the bits of several cluster
  * columns so ONE sort key preserves locality in every dimension, then
  * write range-partitioned on it. With per-file min/max stats riding in
  * the TxTable commit ([[TxTable.append]] `statsCols`), a predicate on
  * ANY clustered column prunes files at plan time — a linear sort gives
  * tight ranges only on its leading column, a z-order gives moderately
  * tight ranges on all of them.
  *
  * This is the read-side 100 TB lever: selective queries open
  * O(selectivity) files instead of O(table). The z-value is pure codegen
  * bit arithmetic (shift/and/or — no UDF, engine-portable), computed
  * once at write time and dropped from the stored rows.
  */
object ZOrder {

  /** Interleaved bit value: bit `i` of column `j` lands at position
    * `i*k + j`. Inputs must be non-negative and are masked to `bits`
    * (callers bucket raw values into [0, 2^bits) — masking is overflow
    * protection, not wraparound semantics).
    */
  def zValue(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 1, "zValue needs at least one column")
    require(bits >= 1 && k * bits <= 62,
      s"k*bits must fit a positive Long: got $k columns x $bits bits")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(
      shiftright(c.cast("long").bitwiseAND(lit((1L << bits) - 1)), i)
        .bitwiseAND(lit(1L)),
      i * k + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Transactional append in z-order: range-partition + sort on the
    * interleaved key (each staged file covers a compact z range, hence a
    * compact range in EVERY cluster column), record per-file stats for
    * `statsCols`, publish as one commit. The helper z column never
    * reaches storage.
    */
  def appendZOrdered(spark: SparkSession, df: DataFrame, table: String,
                     clusterCols: Seq[String], bits: Int, nFiles: Int,
                     statsCols: Seq[String] = Nil): Long = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    val laid = df
      .withColumn("__z", zValue(clusterCols.map(col), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
    TxTable.append(spark, laid,
      table, statsCols = if (statsCols.isEmpty) clusterCols else statsCols)
  }
}
