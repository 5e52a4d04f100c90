package graft.sink

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout for co-located joins — the at-rest answer to
  * "this join shuffles 100 TB every night".
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) by
  * the join key pre-shuffles the data ONCE at write time: each bucket
  * pair joins locally, so the nightly join plan has no Exchange on
  * either side (sort-merge over pre-sorted buckets). The reference
  * re-partitions nothing and leans on Athena to re-shuffle per query;
  * Spark's bucketing moves that cost out of the query path entirely.
  *
  * Bucket-count discipline at scale: both sides must agree (or be
  * integer multiples, `spark.sql.bucketing.coalesceBucketsInJoin`), and
  * n should track data volume — 100 TB / n buckets ≲ executor-memory-
  * sized tasks.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted catalog table (parquet at rest). */
  def writeBucketed(df: DataFrame, table: String, key: String, nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucket-count tables on their bucket key. The returned
    * plan must show NO shuffle on either scan — asserted by the spec.
    */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
