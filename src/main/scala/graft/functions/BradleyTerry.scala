package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bradley–Terry preference-strength estimation (Bradley & Terry 1952;
  * the MM iteration of Hunter 2004) — the model behind pairwise
  * preference aggregation in RLHF/eval pipelines: given aggregated
  * pairwise outcomes `n_{i beats j}`, estimate per-item strengths s with
  * `P(i beats j) = s_i / (s_i + s_j)`.
  *
  * Exact-integer MM form, synchronous updates:
  *   `s'_i = W_i · 10¹² div Σ_{j≠i} (g_ij · 10¹² div (s_i + s_j))`
  * (W_i = total wins of i, g_ij = games between i and j), then
  * normalization `s''_i = s'_i · m·10⁶ div Σ s'` — every division an
  * exact floor, so the whole trajectory replays on any engine.
  *
  * Shape (the [[Raking]] discipline): ONE distributed pass aggregates
  * the corpus of comparisons into the (items × items) grid; the
  * iteration runs driver-side on that bounded grid (items = models /
  * labels / sources — tens, `require`d ≤ maxItems) and the result
  * broadcasts back. Overflow bound: `s'·m·10⁶` stays under 2⁶³ for
  * m ≤ 256 — shard the item universe past that.
  */
object BradleyTerry {

  /** pairs: (winner, loser, n) aggregated outcomes. Returns
    * (item, wins, strength_ppm) after `iterations` MM+normalize rounds
    * from the uniform start s = 10⁶.
    */
  def strengths(pairs: DataFrame, iterations: Int = 3,
                maxItems: Int = 256): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = pairs.sparkSession
    import spark.implicits._
    val rows = pairs
      .select(col("winner").cast("string"), col("loser").cast("string"),
        col("n").cast("long"))
      .as[(String, String, Long)].collect()
    val items = rows.flatMap(r => Seq(r._1, r._2)).distinct.sorted.toSeq
    require(items.size <= maxItems,
      s"BradleyTerry: ${items.size} items exceeds maxItems=$maxItems — " +
        "shard the item universe")
    require(items.size >= 2, "need at least two compared items")
    val wins = rows.groupBy(_._1).map { case (k, v) => k -> v.map(_._3).sum }
      .withDefaultValue(0L)
    val games = scala.collection.mutable.Map[(String, String), Long]()
      .withDefaultValue(0L)
    rows.foreach { case (w, l, n) =>
      games((w, l)) += n; games((l, w)) += n
    }
    val m = items.size
    var s = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iterations) {
      val sNew = items.map { i =>
        val denom = items.iterator.filter(_ != i).map { j =>
          val g = games((i, j))
          if (g == 0L) 0L else g * 1000000000000L / (s(i) + s(j))
        }.sum
        i -> (if (denom == 0L) s(i) else wins(i) * 1000000000000L / denom)
      }.toMap
      val tot = sNew.values.sum
      s = if (tot == 0L) sNew
          else sNew.map { case (k, v) => k -> v * (m * 1000000L) / tot }
    }
    items.map(i => (i, wins(i), s(i))).toDF("item", "wins", "strength_ppm")
  }
}
