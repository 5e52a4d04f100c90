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

  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 leftSaltSource: String, n: Int,
                 joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt",
      pmod(xxhash64(col(leftSaltSource)), lit(n.toLong)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(n.toLong - 1))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
