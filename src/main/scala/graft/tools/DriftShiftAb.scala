package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Drift-threshold validation under a GRADUAL distribution shift
  * (VERDICT r10 item 8): the occupancy-drift stat's measured noise
  * floor (0.23-0.26) came from in-distribution batches and its
  * spec-pinned shifted case was synthetic (all mass in one list); the
  * operational question is how the 0.5 threshold relates to actual
  * search degradation as the data mix rotates. Ten appends draw a
  * GROWING fraction α = i/10 from a second mode (the base vectors
  * pushed along a constant offset direction — a new data source whose
  * vectors concentrate in few lists and sit far from every trained
  * centroid), the mixture-shift shape a real pipeline sees when an
  * upstream source changes. Per append:
  *
  *  - the recorded per-commit TV drift stat,
  *  - ADC recall@10 for 20 of the batch's own queries against the
  *    exact integer-L2 brute gold over the grown corpus — the
  *    quantity stale quantizers actually degrade (no re-rank: the
  *    re-ranked path hides quantization error behind exact L2),
  *  - the same for 20 IN-DISTRIBUTION queries (base rows) — the
  *    standing corpus must not silently degrade either.
  *
  * An unshifted α=0 append runs first as the recall baseline. The
  * SCALE.md curve: TV vs batch recall vs α, with the 0.5 threshold
  * marked. `runMain graft.tools.DriftShiftAb [sfDir]`
  */
object DriftShiftAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val idx = java.nio.file.Files.createTempDirectory("graft_drift")
      .toString + "/idx"
    graft.functions.AnnIndex.build(spark, emb, idx, dim = 64, nCentroids = 16)

    // mode B: every coordinate pushed by 2.0 — a far, concentrated
    // cluster no trained centroid covers (a "new source")
    def modeB(c: org.apache.spark.sql.Column) = transform(c, x => x + lit(2.0f))

    def recallAt(queries: DataFrame, corpus: DataFrame): Double = {
      val ann = graft.functions.AnnIndex.search(spark, idx, queries, k = 10)
        .select(col("query_id"), col("neighbor_id"))
      val gold = graft.functions.Similarity.bruteForceTopKIntL2(queries, corpus, k = 10)
        .select(col("query_id"), col("neighbor_id"), lit(1L).as("__g"))
      ann.join(gold, Seq("query_id", "neighbor_id"), "left")
        .agg(sum(when(col("__g").isNotNull, 1L).otherwise(0L)).as("h"))
        .first().getLong(0) / 200.0
    }

    var corpus = emb
    val baseQ = emb.filter(col("vec_id") <= 19)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .localCheckpoint(true)
    (0 to 10).foreach { i => // i = tenths of the batch drawn from mode B
      val tag = 1000000L * (i + 1)
      val batch = emb.select((col("vec_id") + tag).as("vec_id"),
        when(col("vec_id") % 10 < i, modeB(col("embedding")))
          .otherwise(col("embedding")).as("embedding"))
      graft.functions.AnnIndex.append(spark, batch, idx)
      corpus = corpus.unionByName(batch).localCheckpoint(true)
      val tv = graft.functions.AnnIndex.driftHistory(spark, idx).last._2
      val q = batch.filter(col("vec_id") <= tag + 19)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
        .localCheckpoint(true)
      val rBatch = recallAt(q, corpus)
      val rBase = recallAt(baseQ, corpus)
      println(f"[drift] alpha=${i / 10.0}%.1f tv=$tv%.3f batchRecall@10=$rBatch%.3f " +
        f"baseRecall@10=$rBase%.3f " +
        f"${if (tv >= graft.functions.AnnIndex.DriftThreshold) "<-- THRESHOLD" else ""}")
    }
    spark.stop()
  }
}
