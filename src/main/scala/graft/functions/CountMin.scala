package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch (Cormode & Muthukrishnan 2005) as a pure relational
  * plan: `depth` independent hash rows × `width` buckets, each counter
  * the exact sum of the keys that hash into it, point estimates as the
  * MIN over rows. Complements the Misra-Gries heavy-hitter pass
  * ([[HeavyHitters]]): MG answers "who is frequent", CMS answers "how
  * frequent is ANY key, on demand, from O(d·w) state" — with the
  * classic one-sided error (estimate ≥ truth, overshoot bounded by
  * collisions).
  *
  * Hashes are the portable 60-bit md5-prefix longs (row-salted md5 of
  * the key, mod width), so another engine rebuilds the identical sketch
  * — estimates here are DETERMINISTIC, the gate hash-checks them
  * against a DuckDB replay; only the truth-vs-estimate GAP is
  * data-dependent.
  *
  * 100 TB shape: the sketch build is one map-side-combined hash-agg
  * into ≤ d·w cells — fixed memory regardless of key cardinality, the
  * whole point of sketching at scale (an exact per-key count would
  * shuffle every distinct key). Queries are a broadcast lookup of the
  * d·w cell table.
  */
object CountMin {

  /** Row-salted portable bucket hash: md5("d:" ++ key) mod width. */
  private def bucket(d: Int, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat(lit(s"$d:"), key)), 1, 15), 16, 10).cast("long"),
      lit(width.toLong))

  /** The sketch itself: (d, bucket, counter) — at most depth·width rows. */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
             width: Int = 256): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch shape d=$depth w=$width")
    val rows = (0 until depth).map { d =>
      df.select(lit(d).as("d"),
        bucket(d, col(keyCol).cast("string"), width).as("bucket"))
    }.reduce(_ unionByName _)
    rows.groupBy(col("d"), col("bucket")).agg(count(lit(1)).as("counter"))
  }

  /** Per-distinct-key (key, exact, est): est = min over sketch rows of
    * the counter the key hashes into — always ≥ exact; equality iff the
    * key collides with nothing in at least one row.
    */
  def estimates(df: DataFrame, keyCol: String, depth: Int = 4,
                width: Int = 256): DataFrame = {
    val sk = sketch(df, keyCol, depth, width)
    val exact = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("exact"))
    val probes = (0 until depth).map { d =>
      exact.select(col("key"), col("exact"), lit(d).as("d"),
        bucket(d, col("key"), width).as("bucket"))
    }.reduce(_ unionByName _)
    probes.join(broadcast(sk), Seq("d", "bucket"))
      .groupBy(col("key"), col("exact"))
      .agg(min(col("counter")).as("est"))
  }
}
