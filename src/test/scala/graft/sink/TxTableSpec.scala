package graft.sink

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration._

import graft.SparkSpec

/** Crash-injection + concurrency pins for the transactional commit log:
  * at every interruption point the table must read as EITHER the old
  * state or the new — never missing, never doubled (the failure modes of
  * the rename-swap pattern this replaces).
  */
class TxTableSpec extends SparkSpec {
  import spark.implicits._

  private def mk(): String =
    java.nio.file.Files.createTempDirectory("graft-tx").toString + "/tbl"

  private def ids(table: String): Set[Long] =
    TxTable.read(spark, table).select($"id").as[Long].collect().toSet

  test("appends are versioned and replayed in order") {
    val t = mk()
    assert(TxTable.append(spark, Seq(1L, 2L).toDF("id"), t) == 1L)
    assert(TxTable.append(spark, Seq(3L).toDF("id"), t) == 2L)
    assert(ids(t) == Set(1L, 2L, 3L))
  }

  test("crash before commit: staged files are invisible, vacuum reclaims them") {
    val t = mk()
    TxTable.append(spark, Seq(1L).toDF("id"), t)
    // a writer died after staging, before commit: data dir, no log entry
    Seq(99L).toDF("id").write.parquet(s"$t/batch-orphan")
    assert(ids(t) == Set(1L), "orphan batch must be invisible to readers")
    val gone = TxTable.vacuum(spark, t, minAgeMs = 0L)
    assert(gone.exists(_.startsWith("batch-orphan/")))
    assert(ids(t) == Set(1L), "vacuum must not touch committed data")
  }

  test("transactional compact: same rows, one commit, vacuum drops old files; no missing-table window") {
    val t = mk()
    (1 to 6).foreach(i => TxTable.append(spark, Seq(i.toLong).toDF("id"), t))
    val before = TxTable.currentFiles(spark, t)
    assert(before.size >= 6)
    TxTable.compact(spark, t, targetRowsPerFile = 1000000L)
    assert(ids(t) == (1L to 6L).toSet)
    assert(TxTable.currentFiles(spark, t).size == 1)
    // old files still on disk (still readable by a reader that planned
    // pre-compact) until vacuum reclaims them
    val gone = TxTable.vacuum(spark, t, minAgeMs = 0L)
    assert(before.forall(gone.contains))
    assert(ids(t) == (1L to 6L).toSet)
  }

  test("compacting a partitioned table preserves partition columns and values") {
    val t = mk()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "p")
    val staged = TxTable.stageBatch(spark, df, t, partitionBy = Seq("p"))
    TxTable.commit(spark, t, added = staged, removed = Nil)
    TxTable.commit(spark, t,
      added = TxTable.stageBatch(spark, Seq((4L, "b")).toDF("id", "p"), t, partitionBy = Seq("p")),
      removed = Nil)
    TxTable.compact(spark, t, targetRowsPerFile = 1000000L, partitionBy = Seq("p"))
    val back = TxTable.read(spark, t)
    assert(back.columns.toSet == Set("id", "p"), "partition column dropped by compact")
    assert(back.select($"id", $"p").as[(Long, String)].collect().toSet ==
      Set((1L, "a"), (2L, "b"), (3L, "a"), (4L, "b")))
  }

  test("crash mid-compact (staged, not committed) leaves the old state intact") {
    val t = mk()
    TxTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    // simulate the compaction writer dying after staging its rewrite
    TxTable.read(spark, t).repartition(1).write.parquet(s"$t/batch-halfcompact")
    assert(ids(t) == Set(1L, 2L))
    assert(TxTable.currentFiles(spark, t).size == TxTable.commits(spark, t).head.added.size)
  }

  test("overwrite swaps the full file set in one commit") {
    val t = mk()
    TxTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    TxTable.overwrite(spark, Seq(7L).toDF("id"), t)
    assert(ids(t) == Set(7L))
  }

  test("racing writers: both commits land at distinct versions, no lost update") {
    val t = mk()
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fs = (1 to 4).map(i => Future {
      TxTable.append(spark, Seq(i * 10L).toDF("id"), t)
    })
    val versions = Await.result(Future.sequence(fs), 2.minutes)
    assert(versions.toSet == Set(1L, 2L, 3L, 4L), s"got $versions")
    assert(ids(t) == Set(10L, 20L, 30L, 40L))
  }

  test("empty table reads as empty") {
    assert(TxTable.read(spark, mk()).count() == 0L)
  }

  test("conflict-checked commit against a moved-on table throws instead of replaying a stale file set") {
    val t = mk()
    TxTable.append(spark, Seq(1L).toDF("id"), t)
    val staleHead = TxTable.commits(spark, t).last.version
    val staleFiles = TxTable.currentFiles(spark, t)
    TxTable.append(spark, Seq(2L).toDF("id"), t) // table moves on
    intercept[java.util.ConcurrentModificationException] {
      TxTable.commit(spark, t, added = Nil, removed = staleFiles,
        expectedHead = Some(staleHead))
    }
    assert(ids(t) == Set(1L, 2L), "failed conflict commit must not change state")
  }

  test("vacuum grace window protects compacted-away files for in-flight readers") {
    val t = mk()
    TxTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    val preCompact = TxTable.currentFiles(spark, t)
    TxTable.compact(spark, t, targetRowsPerFile = 1000000L)
    // a reader that planned pre-compact still has an hour by default
    val gone = TxTable.vacuum(spark, t) // default minAgeMs = 1h
    assert(gone.isEmpty, s"grace window violated: deleted $gone")
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(preCompact.forall(f => fs.exists(new org.apache.hadoop.fs.Path(s"$t/$f"))))
  }

  test("vacuum survives a lost empty-dir race (FS that THROWS on non-recursive delete)") {
    // RawLocalFileSystem and HDFS throw (IOException /
    // PathIsNotEmptyDirectoryException) instead of returning false when
    // a cross-process writer lands a file into an aged empty dir
    // between vacuum's listStatus and its delete. The sweep must treat
    // any delete failure as "dir kept" and keep going, not abort the
    // whole vacuum pass (r12 ADVICE, medium).
    spark.sparkContext.hadoopConfiguration
      .set("fs.throwdel.impl", classOf[ThrowingDeleteFileSystem].getName)
    val t = "throwdel://" +
      java.nio.file.Files.createTempDirectory("graft-throwdel").toString + "/tbl"
    TxTable.append(spark, Seq(1L, 2L).toDF("id"), t)
    val fs = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one aged empty dir that "loses the race" (delete throws) and one
    // that should be reaped normally, proving the sweep continued
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/racy-lost"))
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$t/batch-stale"))
    Thread.sleep(5)
    val gone = TxTable.vacuum(spark, t, minAgeMs = 0L)
    assert(gone.contains("batch-stale"),
      s"sweep must continue past the thrown delete: $gone")
    assert(!gone.contains("racy-lost") &&
      fs.exists(new org.apache.hadoop.fs.Path(s"$t/racy-lost")),
      "a lost race keeps the dir")
    assert(TxTable.read(spark, t).count() == 2, "data untouched")
  }

  test("foldSmallFiles: mature files are NEVER rewritten, only the small tail folds") {
    // the append-only audit-log maintenance contract (r13 item 7): a
    // table growing ∝ corpus forever must pay O(new rows), not
    // O(corpus), per fold — so files at or past the target are immortal
    val t = mk()
    // 6 small appends of 10 rows; fold at target 30 → ~2 mature files
    (0 until 6).foreach { i =>
      TxTable.append(spark,
        (i * 10L until i * 10L + 10L).toDF("id"), t, statsCols = Seq("id"))
    }
    assert(TxTable.foldSmallFiles(spark, t, targetRowsPerFile = 30L) > 0)
    val mature = TxTable.currentFilesWithStats(spark, t).filter(_._2
      .find(_.col == TxTable.RowCountStat).exists(_.lo.toLong >= 30L))
      .map(_._1).toSet
    assert(mature.nonEmpty, "the fold must produce at-target files")
    assert(ids(t) == (0L until 60L).toSet, "fold preserves every row")
    // more small appends + a second fold: the mature set is untouched
    (6 until 9).foreach { i =>
      TxTable.append(spark,
        (i * 10L until i * 10L + 10L).toDF("id"), t, statsCols = Seq("id"))
    }
    assert(TxTable.foldSmallFiles(spark, t, targetRowsPerFile = 30L) > 0)
    val after = TxTable.currentFiles(spark, t).toSet
    assert(mature.subsetOf(after),
      s"mature files must survive the fold untouched: ${mature -- after} rewrote")
    assert(ids(t) == (0L until 90L).toSet)
    // stats survive the fold (pruning must not silently turn off)
    assert(TxTable.currentFilesWithStats(spark, t)
      .forall(_._2.exists(_.col == "id")))
    // a lone small file is not worth a commit
    assert(TxTable.foldSmallFiles(spark, t, targetRowsPerFile = 30L) == -1L)
  }
}

/** `delete(recursive = false)` THROWS for dirs named `racy-*` — the
  * HDFS/RawLocalFileSystem behavior when a dir stops being empty between
  * a caller's emptiness check and its delete.
  */
class ThrowingDeleteFileSystem
    extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getScheme: String = "throwdel"
  override def getUri: java.net.URI = java.net.URI.create("throwdel:///")
  override def delete(f: org.apache.hadoop.fs.Path,
                      recursive: Boolean): Boolean =
    if (!recursive && f.getName.startsWith("racy-"))
      throw new java.io.IOException(s"Directory $f is not empty")
    else super.delete(f, recursive)
  // RawLocalFileSystem statuses lazy-load permissions via
  // `new java.io.File(uri)`, which rejects any scheme but "file:" —
  // materialize them (the HostileFileSystem pattern)
  private def eager(s: org.apache.hadoop.fs.FileStatus): org.apache.hadoop.fs.FileStatus =
    new org.apache.hadoop.fs.FileStatus(s.getLen, s.isDirectory,
      s.getReplication, s.getBlockSize, s.getModificationTime,
      s.getModificationTime,
      org.apache.hadoop.fs.permission.FsPermission.getDefault,
      "graft", "graft", s.getPath)
  override def getFileStatus(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus =
    eager(super.getFileStatus(f))
  override def listStatus(f: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] =
    super.listStatus(f).map(eager)
}
