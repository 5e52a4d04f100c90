package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction: when a fact⋈dim join keeps only a
  * selective slice of the fact side, build a bloom filter over the dim
  * keys (ONE small aggregate) and apply `might_contain` to the fact
  * BEFORE its shuffle — non-joining fact rows die at the scan instead of
  * crossing the exchange. Catalyst injects this itself for some shapes
  * (runtime row-level filtering), but only behind selectivity heuristics
  * it can estimate; this operator is the explicit form for when the
  * pipeline KNOWS the dim side is selective.
  *
  * Uses Spark's own codegen'd `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (the runtime-filter kernels) —
  * no UDF, no external sketch. The serialized filter (`numBits/8` bytes,
  * default 1 MB) returns to the driver like a broadcast relation and
  * ships inside the filter literal.
  *
  * Bloom filters have NO false negatives, so `prunedJoin` is exactly
  * `fact.join(dim, key)` — false positives only waste shuffle rows
  * (bounded by the fpp of the sizing), never change the result.
  */
object BloomPrune {

  /** The serialized bloom filter over `keys` (driver-side bytes). */
  def buildFilter(dim: DataFrame, key: Column,
                  expectedItems: Long = 1000000L,
                  numBits: Long = 8L * 1024 * 1024): Array[Byte] = {
    require(expectedItems > 0 && numBits > 0, "bloom sizing must be positive")
    val agg = new BloomFilterAggregate(
      Bridge.expression(xxhash64(key)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = dim.select(Bridge.column(agg).as("bf")).head()
    row.getAs[Array[Byte]](0)
  }

  /** `might_contain(filter, xxhash64(key))` as a filter column. */
  def mightContain(filter: Array[Byte], key: Column): Column =
    Bridge.column(BloomFilterMightContain(
      Literal(filter, BinaryType), Bridge.expression(xxhash64(key))))

  /** Fact rows surviving the bloom pre-filter — apply before the join's
    * exchange. A null filter (empty dim side) keeps nothing, matching
    * inner-join semantics.
    */
  def pruneFact(fact: DataFrame, factKey: Column, dim: DataFrame,
                dimKey: Column, expectedItems: Long = 1000000L,
                numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val bf = buildFilter(dim, dimKey, expectedItems, numBits)
    if (bf == null) fact.limit(0)
    else fact.filter(mightContain(bf, factKey))
  }

  /** The exact inner equi-join, with the fact side bloom-reduced first. */
  def prunedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 expectedItems: Long = 1000000L,
                 numBits: Long = 8L * 1024 * 1024): DataFrame =
    pruneFact(fact, col(key), dim, col(key), expectedItems, numBits)
      .join(dim, Seq(key))
}
