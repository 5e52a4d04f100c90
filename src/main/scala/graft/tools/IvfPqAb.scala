package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B probe: IVFADC coarse leg literal-tree vs centroid-table at the
  * same derived geometry (SCALE.md's round-8 evidence; not part of the
  * library surface).
  *
  * `runMain graft.tools.IvfPqAb <dir> [gen <factor>]` — with `gen`,
  * first writes an embeddings-ONLY organic corpus to <dir> (ScaleGen's
  * exact organic transform: vec_id offset + circular shift per replica)
  * so the 100× ANN probe doesn't pay for 100× of text tables it never
  * reads.
  */
object IvfPqAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.lift(1).contains("gen")) {
      val factor = args.lift(2).map(_.toInt).getOrElse(100)
      val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      val dim = 64
      val all = (0 until factor).map { i =>
        base.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding",
            if (i > 0)
              concat(slice(col("embedding"), i % dim + 1, dim - i % dim),
                slice(col("embedding"), 1, i % dim))
            else col("embedding"))
      }.reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[ab] gen ${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors")
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") <= 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
    def time(tag: String, tables: Option[Boolean],
             maxTrainRows: Long = graft.functions.Similarity.MaxTrainRows): Unit = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.functions.Similarity.ivfPqTopKPortable(queries, emb, k = 10,
            dim = 64, useTablesOpt = tables, maxTrainRows = maxTrainRows)
          .write.mode("overwrite").format("noop").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[ab] $tag median=${ts(1)}%.2f s spread=[${ts.head}%.2f, ${ts.last}%.2f]")
    }
    time("auto(matrix past cap), sampled train (default)", None)
    time("auto(matrix past cap), FULL train (mtr=0)    ", None, maxTrainRows = 0L)
    time("forced-table, sampled train                  ", Some(true))
    // at-rest index (round 9): build ONCE (the one-time production
    // cost, sampled training inside), then time steady-state searches —
    // pruned file listing + ADC + top-k, the shape a session pays
    val idxDir = s"$dir/ann_idx_" + java.util.UUID.randomUUID().toString.take(8)
    val tb = System.nanoTime()
    graft.functions.AnnIndex.build(spark, emb, idxDir, dim = 64)
    println(f"[ab] AnnIndex.build (sampled train + one encode+write pass): ${(System.nanoTime() - tb) / 1e9}%.2f s")
    val probed = graft.functions.AnnIndex.probedFiles(spark, idxDir,
      graft.functions.AnnIndex.probedCids(spark, queries,
        graft.functions.AnnIndex.readMeta(spark, idxDir), nProbe = 8))
    println(s"[ab] AnnIndex probe opens ${probed.size} of " +
      s"${graft.sink.TxTable.currentFiles(spark, idxDir).size} files")
    val ts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      graft.functions.AnnIndex.search(spark, idxDir, queries, k = 10)
        .write.mode("overwrite").format("noop").save()
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    println(f"[ab] AnnIndex.search median=${ts(1)}%.2f s spread=[${ts.head}%.2f, ${ts.last}%.2f]")
    spark.stop()
  }
}
