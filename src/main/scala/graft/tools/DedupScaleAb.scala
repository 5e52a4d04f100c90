package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× organic probe for the signature-dedup families (VERDICT r8
  * item 6 — prefix-join and IVFADC have second-decade evidence,
  * minhash/simhash/semDedup stopped at 10×): generates documents-only
  * and embeddings-only organic corpora (ScaleGen's transforms — token
  * suffixing is a bijection per replica, embeddings circular-shift, so
  * the near-dup RATE stays constant and wall-clock measures the PLAN,
  * not corpus construction) and times the three gate shapes plus the
  * simhash production twin. Survivor counts are printed: organic mode's
  * invariant is per-replica structure identical to the base corpus, so
  * survivors must scale ~exactly linearly.
  *
  * `runMain graft.tools.DedupScaleAb <dir> [gen <factor>]`
  */
object DedupScaleAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.lift(1).contains("gen")) {
      val factor = args.lift(2).map(_.toInt).getOrElse(100)
      val docs = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      (0 until factor).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text",
            if (i > 0) regexp_replace(col("text"), "[\\p{L}\\p{N}]+", s"$$0r$i")
            else col("text"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "embeddings")
      val dim = 64
      (0 until factor).map { i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i * 1000000L))
          .withColumn("embedding",
            if (i > 0) concat(slice(col("embedding"), i % dim + 1, dim - i % dim),
              slice(col("embedding"), 1, i % dim))
            else col("embedding"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      println(s"[dedup100] gen ${spark.read.parquet(s"$dir/documents.parquet").count()} docs, " +
        s"${spark.read.parquet(s"$dir/embeddings.parquet").count()} vectors")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count() // survivor count IS the output; count forces it
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[dedup100] $tag best=${ts.map(_._1).min}%.1f s runs=${ts.map(t => f"${t._1}%.1f").mkString("[", ", ", "]")} survivors=${ts.head._2}")
    }
    time("q23 shape (minhash LSH dedup)")(
      graft.functions.Dedup.minhashDedup(docs, "text", "doc_id"))
    time("q24 shape (portable simhash dedup)")(
      graft.functions.Dedup.simhashDedupPortable(docs, "text", "doc_id"))
    time("b24 shape (xxhash simhash twin)")(
      graft.functions.Dedup.simhashDedup(docs, "text", "doc_id"))
    // nClusters UNSET -> the √n auto rule (the 10× probe at fixed k=16
    // measured 3.56× wall — exactly the fixed-k failure mode the auto
    // default exists for)
    time("q156 shape (semDedup, auto √n clusters)")(
      graft.functions.Similarity.semDedup(emb, "vec_id", "embedding",
        threshold = 0.95))
    time("b156 shape (semDedupTrained, sampled Lloyd)")(
      graft.functions.Similarity.semDedupTrained(emb, "vec_id", "embedding",
        threshold = 0.95))
    spark.stop()
  }
}
