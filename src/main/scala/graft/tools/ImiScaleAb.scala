package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Organic-scale probe for the round-10 list-sizing change: the IMI
  * product grid (constant target cell size → within-cell pair volume
  * LINEAR in n) against the single-level sqrt(n) rule (cell size grows
  * as sqrt(n) → pair volume n^1.5, degrading to n²/4096 past the
  * driver-array cap). Reports, per corpus:
  *
  *  - derived geometries (sqrt(n) lists vs k×k IMI cells),
  *  - EXACT within-cluster pair volumes Σ n·(n−1)/2 from the two
  *    assignments (the quantity the wall-clock follows),
  *  - wall time + survivors for the trained semDedup twins and for the
  *    margin legs (ANN sqrt(n) vs IMI) at 10 queries.
  *
  * Run over the DedupScaleAb `gen` dirs:
  * `runMain graft.tools.ImiScaleAb <dir>` (expects embeddings.parquet).
  * `gen <factor>` first writes an embeddings-only scaled deck (the
  * DedupScaleAb recipe without the documents table — the third-decade
  * probe needs no text); `light` skips the margin legs (their sqrt-rule
  * self-kNN leg is deliberately intractable at the third decade — that
  * is the point being demonstrated by the cheaper pair-volume numbers).
  * IMIAB_RUNS overrides the 2-pass best-of. ScaleGen caveat applies:
  * embedding replicas circular-shift by replica index mod 64, so
  * factors > 64 carry exact duplicate decks — use survivors only as
  * the linear invariant up to 64×; past that read pair volume + wall.
  */
object ImiScaleAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("gen")) {
      val factor = args(args.indexOf("gen") + 1).toInt
      val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      val dim = 64
      (0 until factor).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding",
            if (i > 0) concat(slice(col("embedding"), i % dim + 1, dim - i % dim),
              slice(col("embedding"), 1, i % dim))
            else col("embedding"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[imiAb] gen ${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors")
    }
    val light = args.contains("light")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.count()

    val sqrtLists = graft.functions.Similarity.autoCentroidsTable(n)
    val imiK = graft.functions.Similarity.imiHalfCentroids(
      n, graft.functions.Similarity.ImiTargetClusterSize)
    println(s"[imiAb] n=$n sqrt-rule lists=$sqrtLists imi grid=${imiK}x$imiK " +
      s"(target ${graft.functions.Similarity.ImiTargetClusterSize})")

    def pairVol(counts: org.apache.spark.sql.DataFrame): Long =
      counts.agg(sum(col("count") * (col("count") - 1) / 2).cast("long"))
        .collect().head.getLong(0)
    val sqrtCounts = graft.functions.Similarity
      .assignToLowestIdCentroids(emb, "vec_id", "embedding", sqrtLists)
      .groupBy(col("cluster_id")).count()
    val sqrtPairs = pairVol(sqrtCounts)
    val imiPairs = pairVol(graft.functions.Similarity
      .imiCellCounts(emb, "vec_id", "embedding"))
    println(f"[imiAb] pair volume: sqrt-rule $sqrtPairs%,d  imi $imiPairs%,d  " +
      f"(per row: ${sqrtPairs.toDouble / n}%.0f vs ${imiPairs.toDouble / n}%.0f)")

    val nRuns = sys.env.getOrElse("IMIAB_RUNS", "2").toInt
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to nRuns).map { _ =>
        val t0 = System.nanoTime()
        val c = mk.count()
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, c)
      }
      println(f"[imiAb] $tag best=${ts.map(_._1).min}%.1f s " +
        f"runs=${ts.map(t => f"${t._1}%.1f").mkString("[", ", ", "]")} rows=${ts.head._2}")
    }
    time("semDedupTrained (sqrt-rule lists)")(
      graft.functions.Similarity.semDedupTrained(emb, "vec_id", "embedding"))
    time("semDedupTrainedImi (constant target cells)")(
      graft.functions.Similarity.semDedupTrainedImi(emb, "vec_id", "embedding"))
    if (!light) {
      val queries = emb.filter(col("vec_id") <= 9)
        .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      time("marginTopKAnn (sqrt-rule lists)")(
        graft.functions.Similarity.marginTopKAnn(queries, emb, k = 5))
      time("marginTopKImi (constant target cells)")(
        graft.functions.Similarity.marginTopKImi(queries, emb, k = 5))
    }
    spark.stop()
  }
}
