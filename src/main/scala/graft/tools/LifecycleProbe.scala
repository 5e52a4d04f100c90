package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Job-count/time probe for the e2e lifecycle fixtures (q40/q73): prints
  * per-query Spark job counts and wall time so fixture cost is measured,
  * not guessed (VERDICT r3 next-round #4).
  */
object LifecycleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    @volatile var jobs = 0
    @volatile var jobMs = 0L
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs += 1; starts.put(j.jobId, j.time)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        Option(starts.remove(j.jobId)).foreach(t => jobMs += j.time - t)
      }
    })
    val detail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      private val t0 = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        t0.put(j.jobId, j.time)
        val site = j.stageInfos.lastOption.map(_.name).getOrElse("?")
        val nTasks = j.stageInfos.map(_.numTasks).sum
        detail.add(s"start ${j.jobId} tasks=$nTasks $site")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        Option(t0.remove(j.jobId)).foreach(t => detail.add(s"end ${j.jobId} ${j.time - t}ms"))
    })

    for (name <- Seq("q73_tx_ingestion", "q40_ingestion_lifecycle")) {
      // warm once so codegen/classloading don't pollute the measurement
      graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
      jobs = 0; jobMs = 0L; detail.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val wallMs = (System.nanoTime() - t0) / 1000000
      println(s"[probe] $name: wall=${wallMs}ms jobs=$jobs jobTime=${jobMs}ms " +
        s"nonJob=${wallMs - jobMs}ms")
      detail.forEach(d => println(s"[probe]   $d"))
    }
    spark.stop()
  }
}
