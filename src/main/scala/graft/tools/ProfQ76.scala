package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing for the cluster-dedup queries (q76/q79): portable
  * simhash signatures vs candidate pairs vs the CC iteration vs the
  * final pick — run twice, read the warm pass.
  */
object ProfQ76 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    (1 to 2).foreach { round =>
      println(s"--- pass $round")
      val d = graft.sources.Tables.load(spark, dir, "documents")
      time("sigs")(graft.functions.Dedup.simhash60Agg(d, "text", "doc_id").count())
      val pairs = time("pairs") {
        val p = graft.functions.Dedup.simhashPairsPortable(d, "text", "doc_id")
        p.cache().count(); p
      }
      time("cc") {
        graft.operators.ConnectedComponents.assign(pairs, "idA", "idB").count()
      }
      time("q76 full")(graft.functions.Dedup
        .simhashClustersPortable(d, "text", "doc_id").count())
      time("q79 full") {
        val p2 = graft.functions.Dedup.simhashPairsPortable(d, "text", "doc_id")
        graft.functions.Dedup.bestPerCluster(d, "doc_id", p2, "n_chars").count()
      }
      pairs.unpersist()
    }
    spark.stop()
  }
}
