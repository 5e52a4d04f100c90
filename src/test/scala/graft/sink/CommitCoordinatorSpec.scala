package graft.sink

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import org.apache.hadoop.fs.Path

import graft.SparkSpec

/** The commit-publication seam: exactly-one-winner semantics for both
  * in-tree coordinators under a synchronized-start race, and TxTable
  * committing correctly through a custom coordinator (including one that
  * loses its first race, exercising the retry-at-next-version path).
  */
class CommitCoordinatorSpec extends SparkSpec {
  import spark.implicits._

  private def mk(): String =
    java.nio.file.Files.createTempDirectory("graft-coord").toString + "/tbl"

  private def fsFor(p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def raceWinners(c: CommitCoordinator, n: Int): Seq[(Int, Boolean)] = {
    val dir = java.nio.file.Files.createTempDirectory("graft-race").toString
    val fs = fsFor(dir)
    val target = new Path(s"$dir/00000001.json")
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    try {
      val futures = (1 to n).map { i =>
        pool.submit(new java.util.concurrent.Callable[(Int, Boolean)] {
          def call(): (Int, Boolean) = {
            start.await()
            (i, c.putIfAbsent(fs, target, s"writer-$i".getBytes("UTF-8")))
          }
        })
      }
      start.countDown()
      val res = futures.map(_.get(60, TimeUnit.SECONDS))
      // the published content must be the winner's, intact
      val won = res.filter(_._2).map(_._1)
      if (won.size == 1) {
        val in = fs.open(target)
        val buf = new Array[Byte](64)
        val len = in.read(buf); in.close()
        assert(new String(buf, 0, len, "UTF-8") == s"writer-${won.head}",
          "published bytes must be exactly the winning writer's")
      }
      res
    } finally pool.shutdown()
  }

  test("RenameCommitCoordinator: exactly one of 8 racing writers wins") {
    val res = raceWinners(RenameCommitCoordinator, 8)
    assert(res.count(_._2) == 1, s"exactly one winner expected, got $res")
  }

  test("AtomicCreateCommitCoordinator: exactly one of 8 racing writers wins") {
    val res = raceWinners(AtomicCreateCommitCoordinator, 8)
    assert(res.count(_._2) == 1, s"exactly one winner expected, got $res")
  }

  test("putIfAbsent on an existing commit path always returns false") {
    val dir = java.nio.file.Files.createTempDirectory("graft-race").toString
    val fs = fsFor(dir)
    val target = new Path(s"$dir/00000001.json")
    assert(RenameCommitCoordinator.putIfAbsent(fs, target, "a".getBytes))
    assert(!RenameCommitCoordinator.putIfAbsent(fs, target, "b".getBytes))
    assert(!AtomicCreateCommitCoordinator.putIfAbsent(fs, target, "c".getBytes))
  }

  test("TxTable commits identically through the atomic-create coordinator") {
    val t = mk()
    val files1 = TxTable.stageBatch(spark, Seq(1L, 2L).toDF("id"), t)
    assert(TxTable.commit(spark, t, files1, Nil,
      coordinator = AtomicCreateCommitCoordinator) == 1L)
    val files2 = TxTable.stageBatch(spark, Seq(3L).toDF("id"), t)
    assert(TxTable.commit(spark, t, files2, Nil,
      coordinator = AtomicCreateCommitCoordinator) == 2L)
    assert(TxTable.read(spark, t).select($"id").as[Long].collect().toSet
      == Set(1L, 2L, 3L))
  }

  test("a coordinator losing its first race pushes the commit to the next version") {
    val t = mk()
    val files1 = TxTable.stageBatch(spark, Seq(1L).toDF("id"), t)
    assert(TxTable.commit(spark, t, files1, Nil) == 1L)
    // a "cross-process racer": the first putIfAbsent attempt is beaten by
    // an interloper commit landing at the same version out-of-band
    val interloper = TxTable.stageBatch(spark, Seq(99L).toDF("id"), t)
    var firstAttempt = true
    val racedOnce = new CommitCoordinator {
      def putIfAbsent(fs: org.apache.hadoop.fs.FileSystem, target: Path,
                      bytes: Array[Byte]): Boolean = {
        if (firstAttempt) {
          firstAttempt = false
          val c = TxTable.Commit(2L, interloper, Nil, Nil)
          assert(RenameCommitCoordinator.putIfAbsent(fs, target,
            TxTable.render(c).getBytes("UTF-8")))
          false // we observed the interloper winning our version
        } else RenameCommitCoordinator.putIfAbsent(fs, target, bytes)
      }
    }
    val files2 = TxTable.stageBatch(spark, Seq(2L).toDF("id"), t)
    val v = TxTable.commit(spark, t, files2, Nil, coordinator = racedOnce)
    assert(v == 3L, s"lost race at v2 must land at v3, got v$v")
    assert(TxTable.read(spark, t).select($"id").as[Long].collect().toSet
      == Set(1L, 2L, 99L))
  }
}
