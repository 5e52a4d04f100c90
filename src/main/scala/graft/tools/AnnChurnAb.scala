package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** At-rest ANN index under APPEND CHURN (VERDICT r9 item 6): q235's
  * evidence was build-once/search; production indexes take appends, and
  * each append adds up to nC files (one per touched list), so the
  * probed-file count — and with it steady-state search — drifts until a
  * compaction folds the lists back to ~one file each. This probe:
  *
  *  1. builds the index on 90% of the corpus (derived geometry),
  *  2. appends the remaining 10% in 10 batches, measuring after each:
  *     committed file count, probed-file count for a fixed 20-query
  *     batch, search wall, and the recorded occupancy-drift stat,
  *  3. compacts (clusterBy id, keep cid partitioning) and re-measures.
  *
  * The output is the compact-cadence evidence for SCALE.md: compaction
  * pays when probed files per query batch ≈ appends × probed lists
  * rather than ≈ probed lists.
  *
  * `runMain graft.tools.AnnChurnAb <dir>` (expects embeddings.parquet).
  */
object AnnChurnAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val base = emb.filter(col("vec_id") % 100 >= 10)
    val idx = java.nio.file.Files.createTempDirectory("graft_churn")
      .toString + "/idx"
    var t0 = System.nanoTime()
    graft.functions.AnnIndex.build(spark, base, idx, dim = 64)
    println(f"[churn] build ${base.count()}%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    val queries = emb.filter(col("vec_id") <= 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    def measure(tag: String): Unit = {
      val meta = graft.functions.AnnIndex.readMeta(spark, idx)
      val probed = graft.functions.AnnIndex.probedCids(spark, queries, meta, 8)
      val all = graft.sink.TxTable.currentFiles(spark, idx).size
      val opened = graft.functions.AnnIndex.probedFiles(spark, idx, probed).size
      val t = System.nanoTime()
      val rows = graft.functions.AnnIndex.search(spark, idx, queries, k = 10).count()
      val searchS = (System.nanoTime() - t) / 1e9 // drift read NOT timed:
      // driftHistory lists + parses one sidecar per append — including
      // it inflated "search" with per-append FS cost unrelated to the
      // probe (the number this tool exists to isolate)
      val drift = graft.functions.AnnIndex.driftHistory(spark, idx)
        .lastOption.map(d => f"${d._2}%.3f").getOrElse("-")
      println(f"[churn] $tag%-12s files=$all%4d opened=$opened%4d " +
        f"search=$searchS%5.2f s rows=$rows drift=$drift")
    }
    measure("built")
    (0 until 10).foreach { i =>
      graft.functions.AnnIndex.append(spark,
        emb.filter(col("vec_id") % 100 === i), idx)
      measure(s"append $i")
    }
    t0 = System.nanoTime()
    graft.sink.TxTable.compact(spark, idx, clusterBy = Some("id"),
      partitionBy = Seq("cid"))
    println(f"[churn] compact in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    measure("compacted")
    spark.stop()
  }
}
