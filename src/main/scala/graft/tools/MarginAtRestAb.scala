package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Organic-scale evidence for the at-rest margin index (round-10 item
  * 2): one [[graft.functions.MarginIndex.build]] at derived geometry —
  * which pays training + assignment + the whole self-kNN a-mean leg —
  * then repeated steady-state searches, against the in-session
  * [[graft.functions.Similarity.marginTopKImi]] twin that re-pays all
  * of it per run. The split is the q235 story for the alignment
  * pipeline: build once, probe forever.
  *
  * `runMain graft.tools.MarginAtRestAb <dir>` (expects
  * embeddings.parquet — the DedupScaleAb `gen` layout).
  */
object MarginAtRestAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") <= 9)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    val idx = java.nio.file.Files.createTempDirectory("graft_matrest")
      .toString + "/idx"
    var t0 = System.nanoTime()
    graft.functions.MarginIndex.build(spark, emb, idx)
    println(f"[matrest] build ${emb.count()}%,d rows in ${(System.nanoTime() - t0) / 1e9}%.1f s (train + assign + self-kNN a-means, ONCE)")
    (1 to 3).foreach { i =>
      t0 = System.nanoTime()
      val n = graft.functions.MarginIndex.search(spark, idx, queries, k = 5).count()
      println(f"[matrest] search $i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    t0 = System.nanoTime()
    val n = graft.functions.Similarity.marginTopKImi(queries, emb, k = 5).count()
    println(f"[matrest] in-session twin (rebuilds everything): ${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    spark.stop()
  }
}
