package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Similarity, VecIndex}
import graft.sink.TxTable

/** The streaming SEMANTIC dedup maintainer: each micro-batch dedups
  * against the standing at-rest corpus, records verdicts, and admits
  * the whole batch — exactly-once on BOTH sinks under kill/restart and
  * fresh-checkpoint crash replay, with the verdict stream equal to the
  * one-shot full-corpus run (the q93 contract lifted to embeddings).
  */
class SemDedupStreamSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = graft.sources.Tables.load(spark, SfDir, "embeddings")
    .select($"vec_id", $"embedding")

  test("kill + restart + crash replay: verdicts exactly-once and equal to the one-shot run") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-semstream")
    val staging = tmp.resolve("staging").toString
    val ckpt = tmp.resolve("ckpt").toString
    val index = tmp.resolve("idx").toString
    val verdicts = tmp.resolve("verdicts").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(staging))
    val corpus = emb.filter($"vec_id" < 300)
    VecIndex.build(spark, corpus, index, kPerHalf = 4, iters = 0)
    val meta = VecIndex.readMeta(spark, index)

    // batch 0 plants twins of corpus vectors (must drop); batch 1 is
    // fresh rows (mostly kept). Monotone ids across batches.
    val batches = Seq(
      emb.filter($"vec_id" >= 300 && $"vec_id" < 380)
        .unionByName(corpus.filter($"vec_id" < 20)
          .select(($"vec_id" + 400L).as("vec_id"), $"embedding")),
      emb.filter($"vec_id" >= 430))
    val schema = batches.head.schema
    def stage(i: Int): Unit = {
      val part = tmp.resolve(s"part$i").toString
      batches(i).coalesce(1).write.parquet(part)
      val src = new java.io.File(part).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.move(src.toPath,
        java.nio.file.Paths.get(s"$staging/batch-$i.parquet"))
    }

    // run 1 processes batch 0, then the query stops (the kill)
    stage(0)
    EventsStream.runSemDedupMaintainer(spark, staging, schema, index,
      verdicts, ckpt)
    val v0 = TxTable.read(spark, verdicts).count()
    assert(v0 == batches(0).count(), s"one verdict per batch-0 row, got $v0")
    // every planted twin judged a loser, fresh rows judged keepers
    val dropped = TxTable.read(spark, verdicts)
      .filter(!$"kept").select($"vec_id").as[Long].collect().toSet
    assert((400L until 420L).forall(dropped.contains),
      "planted corpus twins must be judged losers")

    // restart from the SAME checkpoint with batch 1 staged: batch 0
    // must not re-judge or re-land
    stage(1)
    EventsStream.runSemDedupMaintainer(spark, staging, schema, index,
      verdicts, ckpt)
    val all = TxTable.read(spark, verdicts)
    assert(all.count() == batches.map(_.count()).sum,
      "each row judged exactly once across the restart")
    assert(TxTable.read(spark, index).count() ==
      corpus.count() + batches.map(_.count()).sum,
      "the index admits every batch row exactly once")

    // crash-replay shape: a fresh checkpoint re-presents both batch
    // ids — both sinks must skip everything
    val headI = TxTable.headVersion(spark, index)
    val headV = TxTable.headVersion(spark, verdicts)
    EventsStream.runSemDedupMaintainer(spark, staging, schema, index,
      verdicts, tmp.resolve("ckpt2").toString)
    assert(TxTable.headVersion(spark, index) == headI &&
      TxTable.headVersion(spark, verdicts) == headV,
      "replayed batches must publish nothing on either sink")

    // the verdict stream equals the one-shot batch-inclusive run at
    // the frozen geometry, batch by batch (monotone ids)
    val union = corpus.unionByName(batches(0)).unionByName(batches(1))
    val oneShotKept = Similarity.semDedupImi(union, "vec_id", "embedding",
        codebooksOpt = Some((meta.cb1, meta.cb2)))
      .select($"vec_id").as[Long].collect().toSet
    val newIds = batches.map(_.select($"vec_id".cast("long")).as[Long]
      .collect().toSet).reduce(_ ++ _)
    val streamKept = all.filter($"kept").select($"vec_id").as[Long]
      .collect().toSet
    assert(streamKept == (oneShotKept & newIds),
      "streamed verdicts must equal the one-shot full-corpus run")
  }
}
