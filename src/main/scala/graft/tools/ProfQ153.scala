package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Order-strategy probe for the prefix join: value-order vs df-order
  * wall clock + candidate volume at a given SF dir.
  * `runMain graft.tools.ProfQ153 [sfDir]`
  */
object ProfQ153 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val docs = graft.sources.Tables.load(spark, dir, "documents")
    for (warm <- Seq("warm1", "warm2"))
      time(s"$warm value-order")(println("  pairs=" +
        graft.functions.PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6).count()))
    time("value-order")(println("  pairs=" +
      graft.functions.PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6).count()))
    time("df-order")(println("  pairs=" +
      graft.functions.PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6,
        dfOrder = true).count()))
    time("df-order again")(println("  pairs=" +
      graft.functions.PrefixJoin.shingleHashJaccardJoin(docs, "doc_id", "text", 3, 0.6,
        dfOrder = true).count()))
    spark.stop()
  }
}
