package graft.tools
import org.apache.spark.sql.SparkSession
import graft.streaming.EventsStream

object ProfQ41 {
  def main(args: Array[String]): Unit = {
    val cpus = args.headOption.getOrElse("32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](tag: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $tag ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def once(tag: String, dir: String, parts: String, noData: Boolean, shmCk: Boolean): Unit = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      val tmp = java.nio.file.Files.createTempDirectory("graft-prof41")
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$dir/events.parquet"), tmp.resolve("events.parquet"))
      val name = "prof_" + java.util.UUID.randomUUID().toString.replace("-", "")
      var w = EventsStream.hourlyTypeCounts(EventsStream.readEvents(spark, tmp.toString))
        .writeStream.outputMode("update").format("memory").queryName(name)
      if (shmCk) w = w.option("checkpointLocation", s"/dev/shm/graft-ck-$name")
      val q = w.start()
      time(s"$tag process")(q.processAllAvailable())
      q.stop()
      val n = spark.table(name).count()
      println(s"[prof] $tag rows=$n")
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    once("warm", "/root/testdata/sf0.001", "32", true, false)
    once("base32", "/root/testdata/sf0.1", "32", true, false)
    once("parts8", "/root/testdata/sf0.1", "8", true, false)
    once("noData", "/root/testdata/sf0.1", "32", false, false)
    once("shm", "/root/testdata/sf0.1", "32", true, true)
    once("all", "/root/testdata/sf0.1", "8", false, true)
    once("all2", "/root/testdata/sf0.1", "8", false, true)
    spark.stop()
  }
}
