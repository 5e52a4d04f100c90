package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental-SemDeDup churn probe (VERDICT r10 item 1): every
  * in-session semDedup form re-trains and re-assigns the WHOLE corpus
  * per run, so a daily-batch pipeline pays the full corpus cost per
  * refresh; [[graft.functions.VecIndex.dedupBatch]] dedups a batch
  * against the standing at-rest corpus through a frozen map-only
  * assignment + a pruned read of only the batch's own cells. The claim
  * to measure: per-batch cost ∝ batch (× the constant target cell
  * size), NOT corpus. This probe, per deck:
  *
  *  1. builds the VecIndex once on corpus = all replicas but the first
  *     (derived trained geometry) — the one-time cost,
  *  2. times `dedupBatch` for the FIXED 2000-vector first replica
  *     (best of N passes, default 2) — the steady-state per-batch cost
  *     that should stay ~flat as the deck grows a decade,
  *  3. times the in-session batch-inclusive full run
  *     (`semDedupTrainedImi` over corpus ∪ batch) — the cost the
  *     incremental path replaces, which grows with the corpus,
  *  4. re-times dedupBatch at 2× the batch (two replicas) — the
  *     ∝ batch axis.
  *
  * Run over ImiScaleAb `gen` decks:
  * `runMain graft.tools.SemDedupIncrAb <dir>` (expects
  * embeddings.parquet; replica ids are base + i·10⁶, so the fixed
  * batch is `vec_id < 1000000`). ScaleGen caveat: survivor counts are
  * only the linear invariant up to 64× (circular-shift duplicate
  * decks past that) — across decks read the WALL, not survivors.
  */
object SemDedupIncrAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val runs = sys.env.getOrElse("INCRAB_RUNS", "2").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("gen")) { // the ImiScaleAb deck recipe
      val factor = args(args.indexOf("gen") + 1).toInt
      // Optional ε (third arg after `gen`): deterministic per-(id,coord)
      // multiplicative jitter. The plain rotation deck is
      // duplicate-SATURATED past 64× (replicas 64 apart are EXACT twins
      // → standing kth-kept cosines = 1.0 → the margin displacement
      // screen can never fire, so 2M appends measured only the screen
      // floor, SCALE.md r12). With jitter no two rows are identical:
      // rotation-twins sit at cos ≈ 1-ε² with continuous spread, so
      // appended twins land above ~half the standing kth-kept cosines —
      // the ORGANIC fresh-near-neighbor deck that measures real
      // displacement repair (VERDICT r12 → r13 item 2).
      val eps = args.lift(args.indexOf("gen") + 2).map(_.toDouble).getOrElse(0.0)
      val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      val dim = 64
      (0 until factor).map { i =>
        val rot = base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding",
            if (i > 0) concat(slice(col("embedding"), i % dim + 1, dim - i % dim),
              slice(col("embedding"), 1, i % dim))
            else col("embedding"))
        if (eps <= 0.0) rot
        else rot.withColumn("embedding",
          // h(id, j) ∈ [-1, 1] via murmur3 — deterministic, id includes
          // the replica offset so rotation-twins jitter independently
          transform(col("embedding"), (x, j) =>
            (x * (lit(1.0) + lit(eps) *
              ((pmod(hash(col("vec_id"), j), lit(2001)) - lit(1000))
                .cast("double") / lit(1000.0)))).cast("float")))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[incrAb] gen ${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors" +
        (if (eps > 0.0) s" (jitter eps=$eps)" else ""))
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val batch = emb.filter(col("vec_id") < 1000000L)
    val batch2 = emb.filter(col("vec_id") < 2000000L)
    val corpus = emb.filter(col("vec_id") >= 1000000L)
    val (nb, nc) = (batch.count(), corpus.count())
    println(s"[incrAb] corpus=$nc batch=$nb")

    val idx = java.nio.file.Files.createTempDirectory("graft_incr").toString + "/idx"
    var t0 = System.nanoTime()
    graft.functions.VecIndex.build(spark, corpus, idx)
    println(f"[incrAb] build(corpus) once: ${(System.nanoTime() - t0) / 1e9}%.1f s")

    def time(tag: String)(body: => Long): Unit = {
      val walls = (1 to runs).map { _ =>
        val t = System.nanoTime()
        val out = body
        ((System.nanoTime() - t) / 1e9, out)
      }
      val best = walls.minBy(_._1)
      println(f"[incrAb] $tag%-28s best=${best._1}%6.1f s " +
        f"(of ${walls.map(w => f"${w._1}%.1f").mkString("/")}) survivors=${best._2}%,d")
    }
    time("dedupBatch 1x batch") {
      graft.functions.VecIndex.dedupBatch(spark, idx, batch).count()
    }
    time("dedupBatch 2x batch") {
      graft.functions.VecIndex.dedupBatch(spark, idx, batch2).count()
    }
    time("full semDedupTrainedImi") {
      graft.functions.Similarity.semDedupTrainedImi(
        emb, "vec_id", "embedding").count()
    }
    spark.stop()
  }
}
