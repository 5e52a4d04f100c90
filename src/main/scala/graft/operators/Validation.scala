package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.PartitionSpec

/** Post-load validation: source-vs-lake count reconciliation over the same
  * watermark window (reference: validators/base_validator.py:32-55) and the
  * partition-spec rule checks (reference: ingest_mysql_data.py:418-450).
  */
object Validation {

  /** A3/J3: count the lake rows in the run's watermark window and compare
    * to the source count. Spark *is* the lake SQL engine here — one
    * filter+count job over the just-written parquet, with the filter pushed
    * to the scan.
    *
    * For a coalesce delta the window predicate is the OR-decomposed form
    * `(a BETWEEN s AND e OR b BETWEEN s AND e)` — matching the reference's
    * Athena count (aws_utils.py:145-154). This is load-bearing, not just an
    * index trick: the run's end bound is the conservative
    * `least(max(a), max(b))`, so rows whose coalesce value exceeds it are
    * only re-counted through their other column.
    */
  /** The validation-window predicate — the ONE definition every count in
    * a run must share (expected-side and lake-side counts over different
    * predicates produce spurious mismatches).
    */
  def windowPredicate(deltaExpr: String, start: String, end: String):
      org.apache.spark.sql.Column =
    graft.sources.Incremental.parseCoalesceExpr(deltaExpr) match {
      case Some((a, b)) =>
        graft.sources.Incremental.coalesceOrBetween(Seq(col(a), col(b)), start, end)
      case None => expr(deltaExpr).between(lit(start), lit(end))
    }

  def windowCount(df: DataFrame, deltaExpr: String, start: String, end: String): Long =
    df.filter(windowPredicate(deltaExpr, start, end)).count()

  def reconcileCounts(lake: DataFrame, deltaExpr: String, start: String, end: String,
                      sourceCount: Long): (Long, Boolean) = {
    val target = windowCount(lake, deltaExpr, start, end)
    (target, target == sourceCount)
  }

  /** Partition-spec validation, mirroring the reference's rule checks:
    * single column per spec, a format present, and time-of-day formats
    * rejected (only day-or-coarser time buckets make partition columns;
    * reference: ingest_mysql_data.py:418-450). Returns the status code the
    * reference threads to the driver: 1 = no partitions, 2 = non-time,
    * 3 = time-based (mixed → 3).
    */
  def validatePartitionSpecs(specs: Seq[PartitionSpec]): Either[String, Int] = {
    if (specs.isEmpty) return Right(1)
    val errs = specs.flatMap { s =>
      val multi = if (s.column.contains(",")) Some(s"multi-column partition cell: ${s.column}") else None
      val fmt = s.columnType match {
        case PartitionSpec.TimeBased =>
          if (!Set("YYYYMMDD", "YYYYMM", "YYYY").contains(s.format))
            Some(s"time-of-day or unknown time format rejected: ${s.format}")
          else None
        case PartitionSpec.NonTimeBased =>
          try { Transforms.bucketWidth(s.format); None }
          catch { case _: Exception => Some(s"bad bucket width: ${s.format}") }
        case other => Some(s"unknown partition_column_type: $other")
      }
      multi.toSeq ++ fmt.toSeq
    }
    if (errs.nonEmpty) Left(errs.mkString("; "))
    else if (specs.exists(_.columnType == PartitionSpec.TimeBased)) Right(3)
    else Right(2)
  }
}
