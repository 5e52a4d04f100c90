package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs & authorities (Kleinberg, JACM 1999) in exact fixed-point
  * integer arithmetic — the link-analysis complement to [[PageRank]]:
  * authorities are pointed TO by good hubs, hubs point AT good
  * authorities. The mutual recursion runs a fixed number of synchronous
  * rounds, each half-step an edge join + groupBy followed by sum
  * normalization to `m·10⁶` (floor divisions, so the whole trajectory
  * replays bit for bit on any engine).
  *
  * Shape: per round, ONE shuffle per half-step (edge ⋈ score on the
  * source key, partial-agg'd groupBy on the target key); scores are
  * |nodes| rows. Rounds are a fixed small constant (spectral
  * convergence is geometric), so lineage stays bounded — same contract
  * as PageRank's 5 rounds.
  */
object Hits {

  /** (node, hub_ppm, auth_ppm) after `iters` rounds over directed
    * (src, dst) edges (duplicates removed; nodes = all endpoints).
    */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
          iters: Int = 3): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    // persist the (tiny, |E|-row) edge list: every half-step joins it,
    // and without materialization each of the 2·iters joins re-derives
    // the caller's full upstream edge pipeline (measured 5.4 s → edge
    // derivation × 6 on the trade graph)
    val e = edges.select(col(srcCol).cast("long").as("src"),
      col(dstCol).cast("long").as("dst")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // |nodes| is ITERATION-CONSTANT: one O(1) driver scalar (the
    // PageRank discipline) instead of a broadcast-subquery job per
    // half-step — 2·iters fewer jobs, identical values
    val m = nodes.count()
    def normalize(df: DataFrame, c: String): DataFrame = {
      val tot = df.agg(sum(col(c)).as("__tot"))
      df.crossJoin(broadcast(tot))
        .withColumn(c, expr(s"$c * ($m * 1000000) div __tot"))
        .drop("__tot")
    }
    var h = nodes.withColumn("h", lit(1000000L))
    var a = nodes.withColumn("a", lit(1000000L))
    for (_ <- 1 to iters) {
      // authority half-step: a_i = Σ h_j over in-edges j→i
      val aRaw = e.join(h.select(col("node").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst").as("node")).agg(sum(col("h")).as("a"))
      // eager-checkpoint each half-step (the PageRank discipline):
      // `normalize` references its input twice (once for the total, once
      // for the scaled rows) and each half-step references the previous
      // one, so an unmaterialized trajectory re-executes upstream ~2×
      // per reference — 4^iters recompute by the final action (measured:
      // 58 s for 3 rounds on a 25-node graph). A checkpoint is one tiny
      // |nodes|-row job per half-step and also keeps lineage bounded.
      a = normalize(
        nodes.join(aRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("a"), lit(0L)).as("a")), "a")
        .localCheckpoint(true)
      // hub half-step: h_i = Σ a_j over out-edges i→j (the NEW a)
      val hRaw = e.join(a.select(col("node").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src").as("node")).agg(sum(col("a")).as("h"))
      h = normalize(
        nodes.join(hRaw, Seq("node"), "left")
          .select(col("node"), coalesce(col("h"), lit(0L)).as("h")), "h")
        .localCheckpoint(true)
    }
    h.join(a, Seq("node"))
      .select(col("node"), col("h").as("hub_ppm"), col("a").as("auth_ppm"))
  }
}
