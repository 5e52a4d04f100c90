package graft.sink

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A deliberately HOSTILE object-store stand-in (`hostile://`): local
  * files with the two atomicity lies real stores tell, made loud and
  * wide so races that would be microsecond-rare on a laptop become
  * deterministic in a spec.
  *
  *  - `rename` is POSIX-shaped: an existing destination is silently
  *    REPLACED and the call still returns true (HDFS would refuse; S3
  *    "rename" is copy+delete with the same clobber semantics). A sleep
  *    widens the exists-then-rename window of any caller trying to
  *    emulate no-replace rename with a pre-check.
  *  - `create(overwrite = false)` is check-then-act, not O_EXCL
  *    (HADOOP-9361, and every object store without a conditional PUT):
  *    the exists check and the create are separated by a sleep, so
  *    concurrent exclusive-creates can ALL "succeed", last writer wins.
  *
  * Every test that proves a commit protocol safe on `file://` and HDFS
  * should re-run against this to show which guarantees came from the
  * PROTOCOL and which were smuggled in from the filesystem.
  */
class HostileFileSystem extends RawLocalFileSystem {
  import HostileFileSystem.WindowMs

  override def getScheme: String = "hostile"
  override def getUri: URI = URI.create("hostile:///")

  override def rename(src: Path, dst: Path): Boolean = {
    Thread.sleep(WindowMs)
    if (exists(dst)) delete(dst, true) // the lie: clobber, then report success
    super.rename(src, dst)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
      Thread.sleep(WindowMs) // widen the check-then-act gap
    }
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }

  // RawLocalFileSystem's statuses lazy-load permissions via
  // `new java.io.File(uri)`, which rejects any scheme but "file:" —
  // materialize fixed permissions so listings work under hostile://
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getModificationTime,
      FsPermission.getDefault, "graft", "graft", s.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

object HostileFileSystem {
  /** Race-window width: long enough that simultaneous claimants all pass
    * the pre-check before any of them acts.
    */
  val WindowMs = 25L

  /** Register the scheme and return a root path under a fresh temp dir. */
  def root(spark: org.apache.spark.sql.SparkSession): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.hostile.impl", classOf[HostileFileSystem].getName)
    "hostile://" +
      java.nio.file.Files.createTempDirectory("graft-hostile").toString
  }
}
