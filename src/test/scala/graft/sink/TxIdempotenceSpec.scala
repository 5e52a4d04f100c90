package graft.sink

import graft.SparkSpec

/** Writer-transaction idempotence: a retried (appId, writerVersion)
  * append lands exactly once — the Delta `txn`-action contract. Pins the
  * >= guard, per-app independence, watermark survival through checkpoint
  * + log vacuum, concurrent-retry atomicity, staged-file cleanup on
  * skip, and (de)serialization of adversarial app ids.
  */
class TxIdempotenceSpec extends SparkSpec {
  import spark.implicits._

  private def mk() =
    java.nio.file.Files.createTempDirectory("graft-txn").toString + "/tbl"

  test("replaying the same writer version skips and changes nothing") {
    val t = mk()
    val df = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
    assert(TxTable.appendOnce(spark, df, t, "loader", 1L) == Some(1L))
    assert(TxTable.appendOnce(spark, df, t, "loader", 1L) == None)
    assert(TxTable.headVersion(spark, t) == 1L)
    assert(TxTable.read(spark, t).count() == 2L)
    assert(TxTable.txnVersion(spark, t, "loader") == Some(1L))
  }

  test(">= guard: an older writer version skips after a newer one landed") {
    val t = mk()
    val d1 = Seq((1L, 1L)).toDF("id", "v")
    val d2 = Seq((2L, 2L)).toDF("id", "v")
    assert(TxTable.appendOnce(spark, d1, t, "app", 1L).isDefined)
    assert(TxTable.appendOnce(spark, d2, t, "app", 2L).isDefined)
    assert(TxTable.appendOnce(spark, d1, t, "app", 1L) == None)
    assert(TxTable.read(spark, t).count() == 2L)
  }

  test("apps are independent; a plain append carries no txn") {
    val t = mk()
    val df = Seq((1L, 1L)).toDF("id", "v")
    assert(TxTable.appendOnce(spark, df, t, "a", 5L).isDefined)
    assert(TxTable.appendOnce(spark, df, t, "b", 5L).isDefined,
      "same writer version under a different app must land")
    TxTable.append(spark, df, t)
    assert(TxTable.txnVersion(spark, t, "a") == Some(5L))
    assert(TxTable.txnVersion(spark, t, "b") == Some(5L))
    assert(TxTable.read(spark, t).count() == 3L)
  }

  test("watermark survives checkpoint and log vacuum") {
    val t = mk()
    // 12 commits: checkpoint lands at v10, vacuum(0) then deletes the
    // commit JSONs ≤ v10 — the watermark for early versions must persist
    // through the checkpoint, not die with its commit file
    (1L to 12L).foreach { i =>
      assert(TxTable.appendOnce(spark,
        Seq((i, i)).toDF("id", "v"), t, "stream", i).isDefined)
    }
    TxTable.vacuum(spark, t, minAgeMs = 0L)
    assert(TxTable.commits(spark, t).size < 12,
      "vacuum must have cleaned the pre-checkpoint log prefix")
    assert(TxTable.txnVersion(spark, t, "stream") == Some(12L))
    assert(TxTable.appendOnce(spark,
      Seq((3L, 3L)).toDF("id", "v"), t, "stream", 3L) == None,
      "a replay of a vacuumed-away version must still skip")
    assert(TxTable.read(spark, t).count() == 12L)
  }

  test("concurrent retries of the same batch land exactly once") {
    val t = mk()
    TxTable.append(spark, Seq((0L, 0L)).toDF("id", "v"), t) // table exists
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence((1 to 4).map(_ => Future {
      TxTable.appendOnce(spark,
        Seq((1L, 1L)).toDF("id", "v"), t, "retrier", 7L)
    })), 120.seconds)
    assert(results.count(_.isDefined) == 1,
      s"exactly one retry must land, got $results")
    assert(TxTable.read(spark, t).filter($"id" === 1L).count() == 1L)
    // the losing retries cleaned their staged batches: every batch dir on
    // disk is referenced by the log
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(t))
      .map(_.getPath.getName).filter(_.startsWith("batch-")).toSet
    val referenced = TxTable.commits(spark, t)
      .flatMap(_.added).map(_.split("/", 2)(0)).toSet
    assert(batchDirs == referenced,
      s"orphan staged dirs left behind: ${batchDirs -- referenced}")
  }

  test("adversarial app ids round-trip the log and the checkpoint") {
    val t = mk()
    val app = "job ,\"[]/% äöü"
    assert(TxTable.appendOnce(spark,
      Seq((1L, 1L)).toDF("id", "v"), t, app, 2L).isDefined)
    assert(TxTable.txnVersion(spark, t, app) == Some(2L))
    // force through the checkpoint path too
    (2L to 10L).foreach(i => TxTable.append(spark, Seq((i, i)).toDF("id", "v"), t))
    TxTable.vacuum(spark, t, minAgeMs = 0L)
    assert(TxTable.txnVersion(spark, t, app) == Some(2L))
    assert(TxTable.appendOnce(spark,
      Seq((9L, 9L)).toDF("id", "v"), t, app, 1L) == None)
  }
}
