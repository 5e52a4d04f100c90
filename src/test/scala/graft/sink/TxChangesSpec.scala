package graft.sink

import graft.SparkSpec

/** Change-data-feed over the tx log: net row changes from file diff +
  * multiset cancellation. Pins the semantic contract — pure rewrites
  * (compaction) net to ZERO changes, a merge surfaces only the rows it
  * actually changed (old image delete + new image insert), duplicate
  * rows count as a multiset, and schema evolution across the range does
  * not flag untouched rows.
  */
class TxChangesSpec extends SparkSpec {
  import spark.implicits._

  private def mk() =
    java.nio.file.Files.createTempDirectory("graft-cdf").toString + "/tbl"

  private def changes(t: String, from: Long, to: Long): Set[(Long, Long, String)] =
    TxTable.readChanges(spark, t, from, to)
      .select($"id", $"v", $"_change_type")
      .as[(Long, Long, String)].collect().toSet

  test("appends surface as inserts, per version range") {
    val t = mk()
    TxTable.append(spark, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t)
    TxTable.append(spark, Seq((3L, 30L)).toDF("id", "v"), t)
    assert(changes(t, 0L, 1L) ==
      Set((1L, 10L, "insert"), (2L, 20L, "insert")))
    assert(changes(t, 1L, 2L) == Set((3L, 30L, "insert")))
    assert(changes(t, 0L, 2L) ==
      Set((1L, 10L, "insert"), (2L, 20L, "insert"), (3L, 30L, "insert")))
  }

  test("compaction nets to zero; the range spanning it is unaffected") {
    val t = mk()
    TxTable.append(spark, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), t)
    TxTable.append(spark, Seq((3L, 30L)).toDF("id", "v"), t)
    TxTable.compact(spark, t, targetRowsPerFile = 100L)
    // every file was rewritten — the file diff is total — but no ROW changed
    val (addedF, removedF) = TxTable.changedFiles(spark, t, 2L, 3L)
    assert(addedF.nonEmpty && removedF.nonEmpty, "compact must rewrite files")
    assert(changes(t, 2L, 3L).isEmpty, "pure rewrite must net to zero changes")
    assert(changes(t, 1L, 3L) == Set((3L, 30L, "insert")),
      "a range spanning the compaction sees only the real change")
  }

  test("merge surfaces only changed rows: old image delete + new image insert") {
    val t = mk()
    TxTable.append(spark,
      (1L to 100L).map(i => (i, i * 10L, 0L)).toDF("id", "v", "ver").coalesce(1),
      t, statsCols = Seq("id"))
    // update one row in a 100-row file: the whole file rewrites, but the
    // 99 untouched rows must cancel
    TxTable.merge(spark, Seq((5L, -1L, 1L)).toDF("id", "v", "ver"), t,
      key = "id", orderCols = Seq("ver"))
    val got = TxTable.readChanges(spark, t, 1L, 2L)
      .select($"id", $"v", $"ver", $"_change_type")
      .as[(Long, Long, Long, String)].collect().toSet
    assert(got == Set((5L, 50L, 0L, "delete"), (5L, -1L, 1L, "insert")))
  }

  test("delete surfaces as deletes; empty range is empty; bad range throws") {
    val t = mk()
    TxTable.append(spark,
      (1L to 50L).map(i => (i, i)).toDF("id", "v").coalesce(1),
      t, statsCols = Seq("id"))
    TxTable.delete(spark, Seq(7L, 9L).toDF("id"), t, key = "id")
    assert(changes(t, 1L, 2L) == Set((7L, 7L, "delete"), (9L, 9L, "delete")))
    assert(changes(t, 2L, 2L).isEmpty, "from == to is the empty feed")
    intercept[IllegalArgumentException] {
      TxTable.readChanges(spark, t, 2L, 1L)
    }
  }

  test("multiset semantics: duplicate rows count, not collapse") {
    val t = mk()
    TxTable.append(spark,
      Seq((1L, 5L), (1L, 5L), (1L, 5L)).toDF("id", "v").coalesce(1), t)
    // overwrite with ONE surviving copy: net change = 2 deletes
    TxTable.overwrite(spark, Seq((1L, 5L)).toDF("id", "v"), t)
    val got = TxTable.readChanges(spark, t, 1L, 2L)
      .select($"id", $"v", $"_change_type")
      .as[(Long, Long, String)].collect().toSeq
    assert(got.count(_ == ((1L, 5L, "delete"))) == 2 && got.size == 2)
  }

  test("schema evolution across the range does not flag untouched rows") {
    val t = mk()
    TxTable.append(spark, Seq((1L, 10L)).toDF("id", "v"), t)
    TxTable.append(spark, Seq((2L, 20L, "x")).toDF("id", "v", "extra"), t)
    // compact merges the schemas and rewrites everything; old rows gain
    // extra=null on BOTH sides of the diff and must still cancel
    TxTable.compact(spark, t, targetRowsPerFile = 100L)
    assert(TxTable.readChanges(spark, t, 2L, 3L).isEmpty,
      "schema-merged rewrite must net to zero")
    val feed = TxTable.readChanges(spark, t, 1L, 3L)
    assert(feed.columns.toSet == Set("id", "v", "extra", "_change_type"))
    val got = feed.select($"id", $"v", $"extra", $"_change_type")
      .as[(Long, Long, Option[String], String)].collect().toSet
    assert(got == Set((2L, 20L, Some("x"), "insert")))
  }
}
