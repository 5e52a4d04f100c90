package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Order-independent table content checksum — the migration/backfill
  * validation primitive: after rewriting a 100 TB table (compaction,
  * re-partition, engine migration, lake copy), prove the CONTENT is
  * identical without any canonical row order existing on either side.
  *
  * Each row reduces map-side to a 60-bit md5 digest of its caller-chosen
  * canonical representation; the digest is split into two 30-bit halves
  * summed independently as plain BIGINTs. Addition commutes, so the
  * checksum is independent of row order, file layout, and partitioning
  * — and the halves keep every sum exact far past any real table size
  * (2^30 · 2^63-max-rows ≈ overflow at ~8·10^9 rows per GROUP at 2^30
  * magnitude — 8.5e18/2^30 ≈ 7.9e9; shard by a finer group column past
  * that, which the grouped form makes natural).
  *
  * The triple (n_rows, lo_sum, hi_sum) per group is what transfers:
  * equal triples ⟺ equal multisets up to md5 collisions. A multiset
  * DIFFERENCE localizes to the groups whose triples differ, so a
  * mismatched migration bisects by group instead of re-diffing rows.
  *
  * 100 TB shape: one map-side projection (md5 + split), one partial-agg
  * shuffle of |groups| rows. No sort, no distinct, no window.
  */
object Checksum {

  /** 60-bit md5 prefix of the canonical row representation. */
  def rowDigest(repr: Column): Column =
    conv(substring(md5(repr), 1, 15), 16, 10).cast("long")

  /** Per-group (n_rows, lo_sum, hi_sum) over `repr`'s 60-bit digests,
    * each half ≤ 2^30 so BIGINT sums stay exact to billions of rows.
    */
  def grouped(df: DataFrame, group: Column, repr: Column): DataFrame = {
    val h = rowDigest(repr)
    // shiftright == floor-div by 2^30 for the nonneg digest and stays in
    // LONG arithmetic (a double `/` would round: digests reach 2^60 > 2^53)
    df.select(group.as("group"), (h % lit(1073741824L)).as("__lo"),
        shiftright(h, 30).as("__hi"))
      .groupBy(col("group"))
      .agg(count(lit(1)).as("n_rows"), sum(col("__lo")).as("lo_sum"),
        sum(col("__hi")).as("hi_sum"))
  }
}
