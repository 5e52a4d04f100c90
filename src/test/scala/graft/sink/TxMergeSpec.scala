package graft.sink

import graft.SparkSpec

/** Stats-pruned partial-rewrite MERGE: only key-overlapping files are
  * rewritten, updates beat base rows unconditionally, duplicate update
  * keys resolve last-writer-wins by orderCols, inserts land, and
  * far-away inserts must NOT balloon the touch set (per-file overlap,
  * not an envelope).
  */
class TxMergeSpec extends SparkSpec {
  import spark.implicits._

  private def mk() =
    java.nio.file.Files.createTempDirectory("graft-merge").toString + "/tbl"

  /** 4 range-clustered files: [1,100], [101,200], [201,300], [301,400]. */
  private def mkRangeTable(t: String): Unit =
    Seq((1L, 100L), (101L, 200L), (201L, 300L), (301L, 400L)).foreach { case (a, b) =>
      TxTable.append(spark,
        (a to b).map(i => (i, i * 10, 0L)).toDF("id", "v", "ver").coalesce(1), t,
        statsCols = Seq("id"))
    }

  private def state(t: String): Map[Long, (Long, Long)] =
    TxTable.read(spark, t).select($"id", $"v", $"ver")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

  test("only overlapping files rewrite; updates win; inserts land") {
    val t = mk()
    mkRangeTable(t)
    val before = TxTable.currentFiles(spark, t).toSet
    // one low-band update + one far insert: envelope [5, 9999] would
    // rewrite everything; per-file overlap must touch ONLY file 1
    val batch = Seq((5L, -1L, 1L), (9999L, -2L, 1L)).toDF("id", "v", "ver")
    TxTable.merge(spark, batch, t, key = "id", orderCols = Seq("ver"))
    val after = TxTable.currentFiles(spark, t).toSet
    assert(before.intersect(after).size == 3,
      s"exactly 3 of 4 clustered files must survive, got ${before.intersect(after).size}")
    val got = state(t)
    assert(got.size == 401)
    assert(got(5L) == ((-1L, 1L)), "matched key takes the update row")
    assert(got(9999L) == ((-2L, 1L)), "insert key lands")
    assert(got(6L) == ((60L, 0L)) && got(350L) == ((3500L, 0L)),
      "unmatched rows unchanged")
  }

  test("update beats base on tied orderCols; duplicate update keys: last writer wins") {
    val t = mk()
    mkRangeTable(t)
    // same ver as base (tie) — precedence column must still pick the update
    val tied = Seq((150L, -7L, 0L)).toDF("id", "v", "ver")
    TxTable.merge(spark, tied, t, key = "id", orderCols = Seq("ver"))
    assert(state(t)(150L) == ((-7L, 0L)))
    // duplicate keys in one batch: highest orderCols wins
    val dup = Seq((250L, -1L, 1L), (250L, -2L, 5L), (250L, -3L, 3L))
      .toDF("id", "v", "ver")
    TxTable.merge(spark, dup, t, key = "id", orderCols = Seq("ver"))
    assert(state(t)(250L) == ((-2L, 5L)))
  }

  test("empty batch is a no-op; merge into empty table inserts everything") {
    val t = mk()
    mkRangeTable(t)
    val head = TxTable.headVersion(spark, t)
    val v = TxTable.merge(spark,
      Seq.empty[(Long, Long, Long)].toDF("id", "v", "ver"), t,
      key = "id", orderCols = Seq("ver"))
    assert(v == head && TxTable.headVersion(spark, t) == head)
    val t2 = mk()
    TxTable.merge(spark, Seq((1L, 10L, 0L)).toDF("id", "v", "ver"), t2,
      key = "id", orderCols = Seq("ver"))
    assert(state(t2) == Map(1L -> ((10L, 0L))))
  }

  test("delete: only overlapping files rewrite; exact rows removed; misses are no-ops") {
    val t = mk()
    mkRangeTable(t)
    val before = TxTable.currentFiles(spark, t).toSet
    val head = TxTable.headVersion(spark, t)
    // keys entirely outside every file range: nothing touched, no commit
    val miss = Seq(9000L, 9001L).toDF("id")
    assert(TxTable.delete(spark, miss, t, key = "id") == head)
    assert(TxTable.currentFiles(spark, t).toSet == before)
    // a low-band delete (+ null key, which must be dropped, not match-all)
    val del = Seq(Option(110L), Option(120L), Option.empty[Long]).toDF("id")
    TxTable.delete(spark, del, t, key = "id")
    val after = TxTable.currentFiles(spark, t).toSet
    assert(before.intersect(after).size == 3,
      "delete must rewrite only the one overlapping file")
    val got = state(t)
    assert(got.size == 398 && !got.contains(110L) && !got.contains(120L))
    assert(got(119L) == ((1190L, 0L)), "non-matching neighbors survive")
  }

  test("delete of every row in a file shrinks the file set") {
    val t = mk()
    mkRangeTable(t)
    val before = TxTable.currentFiles(spark, t).size
    TxTable.delete(spark, (201L to 300L).toDF("id"), t, key = "id")
    assert(state(t).size == 300 && state(t).keySet.forall(k => k <= 200 || k > 300))
    assert(TxTable.currentFiles(spark, t).size <= before,
      "an emptied file must not be replaced by phantom files")
    // the table still reads consistently after a follow-up merge
    TxTable.merge(spark, Seq((250L, -1L, 9L)).toDF("id", "v", "ver"), t,
      key = "id", orderCols = Seq("ver"))
    assert(state(t)(250L) == ((-1L, 9L)) && state(t).size == 301)
  }

  test("merged files carry key stats so the NEXT merge still prunes") {
    val t = mk()
    mkRangeTable(t)
    TxTable.merge(spark, Seq((50L, -1L, 1L)).toDF("id", "v", "ver"), t,
      key = "id", orderCols = Seq("ver"))
    // every live file (including the merge-rewritten ones) must carry an
    // id stat, and the next merge must touch exactly the files whose
    // range contains its key
    val withStats = TxTable.currentFilesWithStats(spark, t)
    assert(withStats.forall(_._2.exists(_.col == "id")),
      "merge output lost its key stats")
    val before = withStats.map(_._1).toSet
    val expectTouch = withStats.collect {
      case (f, ss) if ss.exists(s =>
        s.col == "id" && s.lo.toLong <= 60L && s.hi.toLong >= 60L) => f
    }.toSet
    assert(expectTouch.nonEmpty && expectTouch.size < before.size)
    TxTable.merge(spark, Seq((60L, -2L, 1L)).toDF("id", "v", "ver"), t,
      key = "id", orderCols = Seq("ver"))
    val after = TxTable.currentFiles(spark, t).toSet
    assert(before.intersect(after) == before -- expectTouch,
      "second merge must rewrite exactly the key-overlapping files")
    assert(state(t)(60L) == ((-2L, 1L)) && state(t)(50L) == ((-1L, 1L)))
  }
}
