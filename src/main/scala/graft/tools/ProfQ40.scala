package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfQ40 {
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
    def once(tag: String, dir: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory("graft-prof40").toString
      val store = new graft.state.LogStore(spark, s"$tmp/logs")
      val run = new graft.driver.IngestionRun(spark, s"$tmp/lake", store)
      val spec = graft.model.IngestionSpec(40L, "table", "local", "gate", "events",
        "ts", "", 0, 1, "fs", "", "event_id", "lv", "events_lv", 1,
        Seq(graft.model.PartitionSpec(1, graft.model.PartitionSpec.TimeBased, "ts", "YYYYMMDD")),
        "gate")
      val ev = graft.sources.Tables.load(spark, dir, "events")
      val cut = "2024-01-15 00:00:00"
      time(s"$tag run1")(run.run(spec, ev.filter(col("ts") < lit(cut))))
      time(s"$tag run2")(run.run(spec, ev))
      time(s"$tag run3")(run.run(spec, ev))
      val nf = graft.sink.Rollback.listFiles(spark, s"$tmp/lake/gate/events").size
      println(s"[prof] $tag lake files=$nf")
    }
    once("warm", "/root/testdata/sf0.001")
    once("sf01a", "/root/testdata/sf0.1")
    once("sf01b", "/root/testdata/sf0.1")
    spark.stop()
  }
}
