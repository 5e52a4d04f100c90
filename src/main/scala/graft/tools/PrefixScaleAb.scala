package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** 100× organic probe for the exact prefix-join family (SCALE.md
  * round-8 evidence): generates a documents-ONLY organic corpus
  * (ScaleGen's exact token-suffix transform — near-dup RATE constant
  * as n grows) and times the family's three entry points on it.
  *
  * `runMain graft.tools.PrefixScaleAb <dir> [gen <factor>]`
  */
object PrefixScaleAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.lift(1).contains("gen")) {
      val factor = args.lift(2).map(_.toInt).getOrElse(100)
      val base = graft.sources.Tables.load(spark, "/root/testdata/sf0.1", "documents")
      val all = (0 until factor).map { i =>
        base.withColumn("doc_id", col("doc_id") + lit(i * 1000000L))
          .withColumn("text",
            if (i > 0) regexp_replace(col("text"), "[\\p{L}\\p{N}]+", s"$$0r$i")
            else col("text"))
      }.reduce(_ unionByName _)
      all.write.mode("overwrite").parquet(s"$dir/documents.parquet")
      println(s"[prefix100] gen ${spark.read.parquet(s"$dir/documents.parquet").count()} docs")
    }
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time(tag: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = mk.count() // pair count IS the output; count forces the join
        spark.catalog.clearCache()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"[prefix100] $tag best=${ts.map(_._1).min}%.1f s runs=${ts.map(t => f"${t._1}%.1f").mkString("[", ", ", "]")} pairs=${ts.head._2}")
    }
    time("q153 shape (md5 shingles, df-order)")(
      graft.functions.PrefixJoin.shingleHashJaccardJoin(
        docs, "doc_id", "text", n = 3, threshold = 0.6, dfOrder = true))
    time("b153 shape (xxhash shingles)")(
      graft.functions.PrefixJoin.shingleFastJaccardJoin(
        docs, "doc_id", "text", n = 3, threshold = 0.6))
    spark.stop()
  }
}
