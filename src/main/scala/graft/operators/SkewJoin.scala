package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SCALE.md): the hot-key antidote
  * when AQE's skew splitting isn't enough (e.g. one key is 30% of the
  * fact table and the dim side can't broadcast).
  *
  * Left (large, skewed) rows get a deterministic salt in [0, n) derived
  * from a unique column; right rows are replicated n ways. The join key
  * becomes (key, salt), spreading each hot key over n reducers. Cost:
  * right side inflates ×n — choose n ≈ skew factor, keep right narrow.
  */
object SkewJoin {

  /** Left-shaped joins only: the right side is replicated n×, so right/
    * full outer would emit unmatched right rows once per replica.
    */
  private val SupportedJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti")

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftSaltSource: String, n: Int,
                 joinType: String = "inner"): DataFrame = {
    require(SupportedJoinTypes.contains(joinType.toLowerCase),
      s"saltedJoin supports left-shaped joins only, got $joinType " +
        "(replicated right side would duplicate unmatched right rows)")
    // null salt source must still land in a real bucket, or the row would
    // join nothing even when its key matches
    val saltedLeft = left.withColumn("__salt",
      coalesce(pmod(xxhash64(col(leftSaltSource)), lit(n.toLong)), lit(0L)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
