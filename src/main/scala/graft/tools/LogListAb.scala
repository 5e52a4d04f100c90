package graft.tools

import org.apache.spark.sql.SparkSession

import graft.sink.TxTable

/** Commit-log LISTING probe (VERDICT r12 → round-13 item 1): at the IMI
  * ceiling decade the live-file listing is ~GBs of paths+stats
  * (~17-50M files), and a `probedFiles` that materializes
  * `currentFilesWithStats` as a driver Seq pays it ON EVERY SEARCH.
  * This probe builds commit logs of synthetic Hive-statted entries
  * across listing decades (no data files — pruning never opens them)
  * and A/Bs the two [[TxTable.prunedFilesIn]] plans on the same log:
  *
  *  - DRIVER: parse checkpoint + suffix, scan every entry's stats;
  *  - RELATIONAL: executor-side prune of the parquet files-checkpoint,
  *    collecting only matched paths.
  *
  * Per decade it reports median wall and DRIVER-THREAD allocated bytes
  * (com.sun.management.ThreadMXBean — executor-task allocations don't
  * land on the calling thread, so this isolates exactly the driver
  * pressure the relational plan is supposed to remove), and REQUIRES
  * the two file sets equal — a probe, with assertions, not prints.
  *
  * `runMain graft.tools.LogListAb [decades=10000,100000,1000000]
  * [probedCells=64] [filesPerCell=16]`
  */
object LogListAb {
  private val tmx = java.lang.management.ManagementFactory.getThreadMXBean
    .asInstanceOf[com.sun.management.ThreadMXBean]

  private def measure[A](reps: Int)(body: => A): (A, Double, Double) = {
    val tid = Thread.currentThread().getId
    var out: A = null.asInstanceOf[A]
    val walls = scala.collection.mutable.ArrayBuffer[Double]()
    val allocs = scala.collection.mutable.ArrayBuffer[Double]()
    (1 to reps).foreach { _ =>
      val a0 = tmx.getThreadAllocatedBytes(tid)
      val t0 = System.nanoTime()
      out = body
      walls += (System.nanoTime() - t0) / 1e9
      allocs += (tmx.getThreadAllocatedBytes(tid) - a0).toDouble
    }
    (out, walls.sorted.apply(reps / 2), allocs.sorted.apply(reps / 2))
  }

  def main(args: Array[String]): Unit = {
    val decades = args.headOption.getOrElse("10000,100000,1000000")
      .split(",").map(_.trim.toInt).toSeq
    val nProbed = args.lift(1).map(_.toInt).getOrElse(64)
    val filesPerCell = args.lift(2).map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"${"files"}%10s ${"cells"}%9s ${"ckptMB"}%7s ${"matched"}%8s " +
      f"${"drv_s"}%8s ${"drvAllocMB"}%11s ${"rel_s"}%8s ${"relAllocMB"}%11s")
    decades.foreach { n =>
      val nCells = math.max(1, n / filesPerCell)
      val dir = java.nio.file.Files.createTempDirectory(s"graft-loglist-$n")
        .toString + "/tbl"
      // synthetic Hive entries: cell c's files are cid=c/part-*.parquet
      // with lo = hi = c stats — the index families' layout; committed
      // in batches, landing on the checkpoint cadence so the parquet
      // files-checkpoint exists at the head
      val perCommit = math.max(1000, n / 100)
      var made = 0
      while (made < n) {
        val batch = (made until math.min(n, made + perCommit)).map { i =>
          val c = i % nCells
          (s"cid=$c/part-$i.parquet", Seq(
            TxTable.ColStat("cid", "L", c.toString, c.toString),
            TxTable.ColStat(TxTable.RowCountStat, "L", "1000", "1000")))
        }
        TxTable.commit(spark, dir, batch.map(_._1), Nil,
          stats = batch.map(_._2))
        made += batch.size
      }
      require(TxTable.liveEntriesDF(spark, dir).isDefined,
        s"no parquet files-checkpoint at n=$n (commit cadence bug)")
      val rnd = new scala.util.Random(42)
      val probed = Set.fill(nProbed)(rnd.nextInt(nCells).toLong)

      spark.conf.set(TxTable.RelationalListingBytesKey, Long.MaxValue.toString)
      val (drvFiles, drvWall, drvAlloc) =
        measure(3)(TxTable.prunedFilesIn(spark, dir, "cid", probed))
      spark.conf.set(TxTable.RelationalListingBytesKey, "1")
      val (relFiles, relWall, relAlloc) =
        measure(3)(TxTable.prunedFilesIn(spark, dir, "cid", probed))
      spark.conf.unset(TxTable.RelationalListingBytesKey)

      require(relFiles.toSet == drvFiles.toSet,
        s"relational ≠ driver at n=$n: ${relFiles.size} vs ${drvFiles.size}")
      val fs = new org.apache.hadoop.fs.Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val ckptMB = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/_graft_txn"))
        .filter(_.getPath.getName.endsWith(".ckpt")).map(_.getLen).max / 1e6
      println(f"$n%10d $nCells%9d $ckptMB%7.1f ${drvFiles.size}%8d " +
        f"$drvWall%8.3f ${drvAlloc / 1e6}%11.1f $relWall%8.3f ${relAlloc / 1e6}%11.1f")
      TxTable.deleteDir(spark, dir)
    }
    spark.stop()
  }
}
