package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: left rows whose timestamp falls inside a
  * right-side [start, end) interval.
  *
  * Spark has no native range-join strategy: `l JOIN r ON l.ts >= r.start
  * AND l.ts < r.end` plans as BroadcastNestedLoopJoin — O(|L|·|R|)
  * predicate evaluations, the classic silent scale-killer. This operator
  * is the standard bucketization rewrite: both sides map to fixed-width
  * time buckets (the interval explodes over every bucket it covers, the
  * point side gets exactly one), the join becomes an EQUI-join on the
  * bucket id, and the exact predicate re-verifies inside the (tiny)
  * bucket-collision candidate set.
  *
  * Each point row carries ONE bucket and an interval covers any bucket at
  * most once, so a matching pair meets exactly once — no post-distinct.
  * Choose `bucketMs` ≈ the typical interval length: shorter buckets
  * explode intervals wider, longer buckets admit more false candidates;
  * both ends stay shuffle-bound to (bucket, payload) skinny rows.
  */
object RangeJoin {

  /** `maxBucketsPerInterval` guards the explode: one pathological
    * interval (end year 9999 at 1 h buckets ≈ 70 M buckets) would
    * otherwise blow Spark's max array length and kill the whole job — a
    * data-dependent crash the naive θ-join would survive. Exceeding rows
    * fail the job with an explicit message naming the offending span;
    * raise `bucketMs` (or pre-filter the interval table) to proceed.
    */
  def intervalJoin(left: DataFrame, ts: Column,
                   right: DataFrame, start: Column, end: Column,
                   bucketMs: Long = 3600000L,
                   maxBucketsPerInterval: Long = 1000000L): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val lBucket = floor(unix_millis(ts) / lit(bucketMs.toDouble)).cast("long")
    // end is EXCLUSIVE: the last covered bucket is the one holding end-1ms
    val rFirst = floor(unix_millis(start) / lit(bucketMs.toDouble)).cast("long")
    val rLast0 = floor((unix_millis(end) - 1) / lit(bucketMs.toDouble)).cast("long")
    val rLast = when(rLast0 - rFirst < lit(maxBucketsPerInterval), rLast0)
      .otherwise(raise_error(format_string(
        s"intervalJoin: interval spans %d buckets at bucketMs=$bucketMs " +
          s"(cap $maxBucketsPerInterval) — raise bucketMs or filter the interval",
        rLast0 - rFirst + 1)).cast("long"))
    val l = left.withColumn("__rj_bucket", lBucket)
    val r = right
      .filter(end > start) // empty/negative intervals match nothing
      .withColumn("__rj_bucket", explode(sequence(rFirst, rLast)))
    l.join(r, Seq("__rj_bucket"))
      .filter(ts >= start && ts < end)
      .drop("__rj_bucket")
  }

  /** KEYED interval join — the SCD2 temporal-join shape: each left row
    * matches right intervals of the SAME key containing its timestamp
    * ("the dimension version valid when this fact happened"). Identical
    * bucketization, but the equi-join runs on (key, bucket), so a hot
    * time bucket no longer collides across unrelated keys — candidate
    * volume tracks per-key interval density, the quantity that's
    * actually bounded in an SCD2 dimension (versions per entity).
    */
  def intervalJoinKeyed(left: DataFrame, lKey: Column, ts: Column,
                        right: DataFrame, rKey: Column,
                        start: Column, end: Column,
                        bucketMs: Long = 3600000L,
                        maxBucketsPerInterval: Long = 1000000L): DataFrame = {
    require(bucketMs > 0, s"bucketMs must be positive, got $bucketMs")
    require(maxBucketsPerInterval > 0,
      s"maxBucketsPerInterval must be positive, got $maxBucketsPerInterval")
    val lBucket = floor(unix_millis(ts) / lit(bucketMs.toDouble)).cast("long")
    val rFirst = floor(unix_millis(start) / lit(bucketMs.toDouble)).cast("long")
    val rLast0 = floor((unix_millis(end) - 1) / lit(bucketMs.toDouble)).cast("long")
    val rLast = when(rLast0 - rFirst < lit(maxBucketsPerInterval), rLast0)
      .otherwise(raise_error(format_string(
        s"intervalJoinKeyed: interval spans %d buckets at bucketMs=$bucketMs " +
          s"(cap $maxBucketsPerInterval) — raise bucketMs or filter the interval",
        rLast0 - rFirst + 1)).cast("long"))
    val l = left.withColumn("__rj_bucket", lBucket).withColumn("__rj_k", lKey)
    val r = right
      .filter(end > start)
      .withColumn("__rj_bucket", explode(sequence(rFirst, rLast)))
      .withColumn("__rj_k", rKey)
    l.join(r, Seq("__rj_k", "__rj_bucket"))
      .filter(ts >= start && ts < end)
      .drop("__rj_bucket", "__rj_k")
  }
}
