package graft.sink

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Small-file compaction for an append-heavy lake table — the
  * maintenance job the reference's per-chunk appends make necessary
  * (SURVEY.md §7.4: one file set per 400k-row chunk → small-file
  * explosion at scale).
  *
  * Rewrites the table at a target file granularity: read (merged
  * schema), repartition to ≈ rows/targetRowsPerFile tasks — keyed by
  * the partition columns so each output file stays within one Hive
  * partition — and atomically swap via a staging directory. Sorting
  * within partitions by `clusterBy` re-establishes row-group pruning on
  * that column.
  */
object Compaction {

  def compactTable(spark: SparkSession, path: String,
                   partitionCols: Seq[String] = Nil,
                   clusterBy: Option[String] = None,
                   targetRowsPerFile: Long = 5000000L): Long = {
    val df = spark.read.option("mergeSchema", "true").parquet(path)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val repart =
      if (partitionCols.nonEmpty) df.repartition(nFiles, partitionCols.map(col): _*)
      else df.repartition(nFiles)
    val clustered = clusterBy.filter(repart.columns.contains)
      .map(c => repart.sortWithinPartitions(c)).getOrElse(repart)

    val staging = s"$path.__compacting"
    val writer = clustered.write.mode(SaveMode.Overwrite)
      .option("compression", "snappy")
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .parquet(staging)

    // swap via rename (atomic on HDFS/local; on S3 slot in a committer or
    // table format). Crash window: between the two renames the live path
    // is absent but the `.__precompact` backup holds the full table —
    // hence the stale-backup refusal below: its presence means a prior
    // swap died mid-flight and must be restored by an operator, not
    // silently clobbered.
    val hPath = new org.apache.hadoop.fs.Path(path)
    val hStaging = new org.apache.hadoop.fs.Path(staging)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val backup = new org.apache.hadoop.fs.Path(s"$path.__precompact")
    if (fs.exists(backup)) {
      fs.delete(hStaging, true)
      throw new IllegalStateException(
        s"stale backup $backup exists (prior compaction died mid-swap); restore it first")
    }
    if (!fs.rename(hPath, backup)) {
      fs.delete(hStaging, true)
      throw new RuntimeException(s"compaction: could not move $path aside")
    }
    if (!fs.rename(hStaging, hPath)) {
      fs.rename(backup, hPath) // restore on failure
      throw new RuntimeException(s"compaction swap failed for $path")
    }
    fs.delete(backup, true)
    rows
  }
}
