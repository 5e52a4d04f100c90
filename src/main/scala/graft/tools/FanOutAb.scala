package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal A/B isolating the FanOut + heavy-projection + localCheckpoint
  * shape: where does the md5/shingle map pass actually execute, and at
  * what parallelism? Prints every stage with task count.
  */
object FanOutAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val ms = sc.stageInfo.completionTime.getOrElse(0L) - sc.stageInfo.submissionTime.getOrElse(0L)
        println(f"[fanoutab] stage ${sc.stageInfo.stageId}%3d ${ms / 1000.0}%7.3f s tasks=${sc.stageInfo.numTasks} ${sc.stageInfo.name.take(70)}")
      }
    })
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def heavy(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("__pjt", TextFunctions.tokens(col("text")))
      .withColumn("__set", transform(TextFunctions.shingles(col("__pjt"), 3),
        s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
      .select(col("doc_id").cast("long").as("id"), array_distinct(col("__set")).as("els"))
      .filter(size(col("els")) > 0)
      .select(col("id"), size(col("els")).as("n"), array_sort(col("els")).as("els"))
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[fanoutab] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    heavy(docs).write.mode("overwrite").format("noop").save()
    println("[fanoutab] --- A: no fanout, checkpoint ---")
    time("A")(heavy(docs).localCheckpoint(true)).unpersist()
    println("[fanoutab] --- B: fanout below projection, checkpoint ---")
    time("B")(heavy(docs.repartition(32)).localCheckpoint(true)).unpersist()
    println("[fanoutab] --- C: fanout, noop only ---")
    time("C")(heavy(docs.repartition(32)).write.mode("overwrite").format("noop").save())
    println("[fanoutab] --- D: hash fanout by id, noop only ---")
    time("D")(heavy(docs.repartition(32, col("doc_id"))).write.mode("overwrite").format("noop").save())
    println("[fanoutab] --- E: hash fanout by id, checkpoint ---")
    time("E")(heavy(docs.repartition(32, col("doc_id"))).localCheckpoint(true)).unpersist()
    println("[fanoutab] --- D2: hash fanout repeat ---")
    time("D2")(heavy(docs.repartition(32, col("doc_id"))).write.mode("overwrite").format("noop").save())
    println("[fanoutab] --- A2: no fanout repeat ---")
    time("A2")(heavy(docs).localCheckpoint(true)).unpersist()
    spark.stop()
  }
}
