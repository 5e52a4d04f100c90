package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CUPED variance reduction (Deng, Xu, Kohavi & Walker, WSDM 2013):
  * adjust each experiment arm's outcome total by the pooled linear
  * relationship between a pre-experiment covariate x and the outcome y
  * — `ŷ_i = y_i − θ(x_i − x̄)` with `θ = Cov(x,y)/Var(x)` — removing
  * the outcome variance that pre-period behavior already explains.
  *
  * Exact-integer form (the engine's portability discipline): with x, y
  * integer unit totals,
  * `θ_bp = (n·Σxy − Σx·Σy) · 10⁴ div (n·Σx² − (Σx)²)` and the per-arm
  * adjusted total `adj_bp = Σ_a y · 10⁴ − θ_bp·(n·Σ_a x − n_a·Σx) div n`
  * (the mean-centering term cleared of its 1/n rationals). Every
  * quantity replays bit for bit on any engine. Magnitude bound: the
  * worst term is `n·Σx²·10⁴` — keep `n · (Σx²) < 9·10¹⁴` (unit-scale
  * the covariate; at larger populations shard by stratum and pool, the
  * standard stratified-CUPED form).
  *
  * Shape: one groupBy(unit) upstream of the caller, ONE scalar
  * aggregate for the pooled moments (broadcast), one groupBy(arm) over
  * |arms| rows. θ is computed from the POOLED sample (both arms), the
  * standard CUPED choice — it keeps the adjustment unbiased under the
  * null.
  */
object Cuped {

  /** Input: one row per experiment unit with integer columns
    * (arm, x, y). Output per arm: n_units, sum_x, sum_y, theta_bp
    * (pooled, identical across arms), adj_sum_bp.
    */
  def adjust(units: DataFrame): DataFrame = {
    val g = units.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(expr("x * x")).as("sxx_raw"), sum(expr("x * y")).as("sxy_raw"))
    units.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_units"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"))
      .crossJoin(broadcast(g))
      .withColumn("theta_bp",
        when(expr("n * sxx_raw - sx * sx") > 0L,
          expr("(n * sxy_raw - sx * sy) * 10000 div (n * sxx_raw - sx * sx)"))
          .otherwise(lit(0L)))
      .withColumn("adj_sum_bp",
        expr("sum_y * 10000 - theta_bp * (n * sum_x - n_units * sx) div n"))
      .select(col("arm"), col("n_units"), col("sum_x"), col("sum_y"),
        col("theta_bp"), col("adj_sum_bp"))
  }
}
