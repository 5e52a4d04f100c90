package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Similarity

/** Recall/cost sweep for the IVF ANN parameters (nCentroids × nProbe ×
  * Lloyd iters) against the exact brute-force top-10 at fixed seeds —
  * the measurement behind ivfTopK's defaults and AnnRecallSpec's floor.
  *
  * Usage: runMain graft.tools.IvfSweep [sfDir]
  */
object IvfSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb = graft.sources.Tables.load(spark, dir, "embeddings")
    val queries = emb.filter($"vec_id" <= 20)
      .select($"vec_id".as("query_id"), $"embedding".as("query_vec"))
    def topSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select($"query_id".cast("long"), $"neighbor_id".cast("long"))
        .as[(Long, Long)].collect().toSeq
        .groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
    val exact = topSets(Similarity.bruteForceTopK(queries, emb, 10))
    def recall(approx: Map[Long, Set[Long]]): Double =
      exact.map { case (q, ex) =>
        approx.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
      }.sum / exact.size
    val n = emb.count()
    println(s"corpus=$n dir=$dir  (probed fraction ~ nProbe/nCentroids)")
    for (nc <- Seq(8, 16, 32); np <- Seq(2, 4, 6, 8) if np <= nc; it <- Seq(3, 5)) {
      val t0 = System.nanoTime()
      val r = recall(topSets(Similarity.ivfTopK(queries, emb, k = 10,
        nCentroids = nc, nProbe = np, iters = it)))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"nCentroids=$nc%3d nProbe=$np%2d iters=$it  recall@10=$r%.4f  ${sec}%5.1fs  frac=${np.toDouble / nc}%.2f")
    }
    spark.stop()
  }
}
