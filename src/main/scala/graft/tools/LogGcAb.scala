package graft.tools

import org.apache.spark.sql.SparkSession

import graft.model.{ReasonCode, RunLog, RunStatus}
import graft.state.LogStore

/** LogStore maintenance-loop probe (VERDICT r10 item 6): `compact()` +
  * `vacuumCompacted()` are hostile-store-proven, but nothing measured
  * the FLEET-scale loop — N appends/day × M tables for a year is
  * thousands of cycles per log, and the failure mode a year out would
  * be unbounded file/manifest accumulation or listing-time growth.
  * This probe runs `cycles` (default 1000) append cycles with a
  * compact-every-C + vacuum-after-compact cadence and reports, every
  * 100 cycles: visible files, TOTAL dir entries (manifests + garbage
  * — what a listing actually pays), and the watermark-recovery read
  * wall. The bound to verify: both file counts and the read wall stay
  * FLAT — the loop reclaims everything it retires.
  *
  * Vacuum runs with minAgeMs=0: a single-process probe has no
  * in-flight readers, so the grace window (whose correctness the
  * hostile spec pins) would only defer the deletions this probe
  * counts. `runMain graft.tools.LogGcAb [cycles=1000] [compactEvery=10]`
  */
object LogGcAb {
  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(1000)
    val compactEvery = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = java.nio.file.Files.createTempDirectory("graft_loggc").toString + "/log"
    val store = new LogStore(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var vacuumed = 0L
    val t0 = System.nanoTime()
    (1 to cycles).foreach { i =>
      store.append(Seq(RunLog(i % 7L, RunStatus.Success,
        s"2024-01-01 00:00:0$i", s"2024-01-02 00:00:00.$i",
        i.toLong, i.toLong, ReasonCode.Subsequent, LogStore.now())))
      if (i % compactEvery == 0) {
        store.compact()
        vacuumed += store.vacuumCompacted(minAgeMs = 0L).size
      }
      if (i % 100 == 0) {
        val entries = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        val manifests = entries.count(_.getPath.getName.startsWith("_compact-"))
        val tR = System.nanoTime()
        val rows = store.read().count()
        val readS = (System.nanoTime() - tR) / 1e9
        println(f"[loggc] cycle $i%5d: dirEntries=${entries.length}%3d " +
          f"(manifests=$manifests%2d) rows=$rows%5d read=$readS%5.2f s " +
          f"reclaimed=$vacuumed%5d elapsed=${(System.nanoTime() - t0) / 1e9}%6.1f s")
      }
    }
    // the year-out invariant: everything retired is gone, one live
    // data file + at most one live manifest remain
    store.compact()
    vacuumed += store.vacuumCompacted(minAgeMs = 0L).size
    val fin = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
    println(s"[loggc] final dir: ${fin.map(_.getPath.getName).sorted.mkString(", ")}")
    println(f"[loggc] total reclaimed=$vacuumed rows=${store.read().count()}")
    spark.stop()
  }
}
