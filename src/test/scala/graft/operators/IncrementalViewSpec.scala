package graft.operators

import graft.SparkSpec
import graft.sink.TxTable
import org.apache.spark.sql.DataFrame

/** Incremental view maintenance: the refreshed derived aggregate must be
  * row-identical to recomputing it from the base table's current state,
  * across appends, merges (update = delete+insert), deletes, compaction
  * (nets to zero), group birth and group death, null group keys, and
  * composed multi-step refreshes.
  */
class IncrementalViewSpec extends SparkSpec {
  import spark.implicits._

  private val Keys = Seq("k")
  private val Sums = Seq("v")

  private def mk() =
    java.nio.file.Files.createTempDirectory("graft-ivm").toString + "/tbl"

  private def assertSame(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq)
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      s"got ${got.collect().toSeq.sortBy(_.toString)} " +
        s"want ${want.collect().toSeq.sortBy(_.toString)}")
  }

  private def recompute(t: String): DataFrame =
    IncrementalView.compute(TxTable.read(spark, t), Keys, Sums)

  test("refresh equals recompute across merge, delete and compaction") {
    val t = mk()
    TxTable.append(spark,
      (1L to 100L).map(i => (i % 7, i, 0L)).toDF("k", "v", "ver")
        .repartition(4), t, statsCols = Seq("k"))
    val v1 = TxTable.headVersion(spark, t)
    val derived = IncrementalView.compute(TxTable.readAt(spark, t, v1), Keys, Sums)
    TxTable.merge(spark, Seq((3L, -100L, 1L)).toDF("k", "v", "ver"),
      t, key = "k", orderCols = Seq("ver"))
    // the merge collapsed key 3 to one row; delete key 5 entirely
    TxTable.delete(spark, Seq(5L).toDF("k"), t, key = "k")
    TxTable.compact(spark, t, targetRowsPerFile = 1000L)
    val head = TxTable.headVersion(spark, t)
    val got = IncrementalView.refresh(spark, t,
      derived.select("k", "n_rows", "v"), v1, head, Keys, Sums)
    assertSame(got, recompute(t))
  }

  test("group birth and group death") {
    val t = mk()
    TxTable.append(spark, Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("k", "v"), t)
    val derived = recompute(t)
    TxTable.append(spark, Seq((9L, 90L)).toDF("k", "v"), t)      // birth
    TxTable.delete(spark, Seq(2L).toDF("k"), t, key = "k")       // death
    val got = IncrementalView.refresh(spark, t, derived, 1L,
      TxTable.headVersion(spark, t), Keys, Sums)
    assertSame(got, recompute(t))
    assert(got.filter($"k" === 2L).isEmpty, "emptied group must vanish")
    assert(got.filter($"k" === 9L).count() == 1, "new group must appear")
  }

  test("null group key is a real group, maintained null-safely") {
    val t = mk()
    TxTable.append(spark,
      Seq((Some(1L), 10L), (None, 7L), (None, 8L)).toDF("k", "v"), t)
    val derived = recompute(t)
    TxTable.overwrite(spark,
      Seq((Some(1L), 10L), (None, 7L)).toDF("k", "v"), t)
    val got = IncrementalView.refresh(spark, t, derived, 1L, 2L, Keys, Sums)
    assertSame(got, recompute(t))
    assert(got.filter($"k".isNull && $"n_rows" === 1L && $"v" === 7L).count() == 1)
  }

  test("two sequential refreshes compose to the two-version jump") {
    val t = mk()
    TxTable.append(spark, (1L to 40L).map(i => (i % 3, i)).toDF("k", "v"), t)
    val d1 = recompute(t)
    TxTable.append(spark, Seq((0L, 1000L)).toDF("k", "v"), t)
    val d2 = IncrementalView.refresh(spark, t, d1, 1L, 2L, Keys, Sums)
    TxTable.delete(spark, Seq(1L).toDF("k"), t, key = "k")
    val stepwise = IncrementalView.refresh(spark, t, d2, 2L, 3L, Keys, Sums)
    val jump = IncrementalView.refresh(spark, t, d1, 1L, 3L, Keys, Sums)
    assertSame(stepwise, jump)
    assertSame(stepwise, recompute(t))
  }

  test("pure rewrite refresh is a no-op; bad derived schema fails loudly") {
    val t = mk()
    TxTable.append(spark, (1L to 20L).map(i => (i % 4, i)).toDF("k", "v"), t)
    val derived = recompute(t)
    TxTable.compact(spark, t, targetRowsPerFile = 5L)
    val got = IncrementalView.refresh(spark, t, derived, 1L, 2L, Keys, Sums)
    assertSame(got, derived)
    intercept[IllegalArgumentException] {
      IncrementalView.applied(derived.withColumnRenamed("v", "wrong"),
        derived, Keys, Sums)
    }
  }

  test("unknown change type fails loudly instead of mis-signing") {
    import org.apache.spark.sql.functions.lit
    val bad = Seq((1L, 2L)).toDF("k", "v")
      .withColumn("_change_type", lit("upsert"))
    val e = intercept[Exception] {
      IncrementalView.deltas(bad, Keys, Sums).collect()
    }
    assert(e.getMessage.contains("unknown _change_type"))
  }

  // ------------------------------------------------------- join views

  /** facts (cust, v), dim (cust, nation); view = per-nation count/sum. */
  private def mkJoin(): (String, String) = {
    val r = mk(); val s = mk()
    TxTable.append(spark,
      (1L to 60L).map(i => (i % 10, i)).toDF("cust", "v")
        .repartitionByRange(4, $"cust"), r, statsCols = Seq("cust"))
    TxTable.append(spark,
      (0L to 9L).map(c => (c, c % 3)).toDF("cust", "nation"), s)
    (r, s)
  }

  private def recomputeJoin(r: String, s: String): DataFrame =
    IncrementalView.computeJoin(TxTable.read(spark, r), TxTable.read(spark, s),
      "cust", Seq("nation"), Sums)

  test("join view: refresh equals recompute when both sides change") {
    val (r, s) = mkJoin()
    val derived = recomputeJoin(r, s)
    // facts: update one row, insert rows for an existing cust, delete a cust's rows
    TxTable.merge(spark, Seq((3L, -1000L)).toDF("cust", "v"),
      r, key = "cust", orderCols = Seq("v"))
    TxTable.append(spark, Seq((7L, 500L), (7L, 501L)).toDF("cust", "v"), r)
    TxTable.delete(spark, Seq(4L).toDF("cust"), r, key = "cust")
    // dim: move cust 5 to another nation (update = delete+insert),
    // drop cust 6 entirely (its facts leave the view)
    TxTable.merge(spark, Seq((5L, 99L)).toDF("cust", "nation"),
      s, key = "cust", orderCols = Seq("nation"))
    TxTable.delete(spark, Seq(6L).toDF("cust"), s, key = "cust")
    val got = IncrementalView.refreshJoin(spark, r, s, derived,
      1L, TxTable.headVersion(spark, r), 1L, TxTable.headVersion(spark, s),
      "cust", Seq("nation"), Sums)
    assertSame(got, recomputeJoin(r, s))
    assert(got.filter($"nation" === 99L).count() == 1,
      "dim update must birth the new nation group")
  }

  test("join view: fact-only and dim-only changes each refresh correctly") {
    val (r, s) = mkJoin()
    val d0 = recomputeJoin(r, s)
    TxTable.append(spark, Seq((2L, 777L)).toDF("cust", "v"), r)
    val rv = TxTable.headVersion(spark, r)
    val d1 = IncrementalView.refreshJoin(spark, r, s, d0,
      1L, rv, 1L, 1L, "cust", Seq("nation"), Sums)
    assertSame(d1, recomputeJoin(r, s))
    TxTable.merge(spark, Seq((0L, 50L)).toDF("cust", "nation"),
      s, key = "cust", orderCols = Seq("nation"))
    val d2 = IncrementalView.refreshJoin(spark, r, s, d1,
      rv, rv, 1L, TxTable.headVersion(spark, s), "cust", Seq("nation"), Sums)
    assertSame(d2, recomputeJoin(r, s))
  }

  test("join view: fact insert for a dim key inserted in the SAME window") {
    val (r, s) = mkJoin()
    val derived = recomputeJoin(r, s)
    TxTable.append(spark, Seq((100L, 5L)).toDF("cust", "nation"), s)
    TxTable.append(spark, Seq((100L, 42L), (100L, 43L)).toDF("cust", "v"), r)
    val got = IncrementalView.refreshJoin(spark, r, s, derived,
      1L, TxTable.headVersion(spark, r), 1L, TxTable.headVersion(spark, s),
      "cust", Seq("nation"), Sums)
    assertSame(got, recomputeJoin(r, s))
    assert(got.filter($"nation" === 5L && $"n_rows" === 2L).count() == 1)
  }

  test("join view: compaction on the fact side nets to zero") {
    val (r, s) = mkJoin()
    val derived = recomputeJoin(r, s)
    TxTable.compact(spark, r, targetRowsPerFile = 1000L)
    val got = IncrementalView.refreshJoin(spark, r, s, derived,
      1L, TxTable.headVersion(spark, r), 1L, 1L,
      "cust", Seq("nation"), Sums)
    assertSame(got, derived)
  }

  test("joinFeed rejects states carrying _change_type and column overlap") {
    import org.apache.spark.sql.functions.lit
    val feed = Seq((1L, 2L)).toDF("cust", "v")
      .withColumn("_change_type", lit("insert"))
    val state = Seq((1L, 3L)).toDF("cust", "nation")
    intercept[IllegalArgumentException] { // state on a feed slot
      IncrementalView.joinFeed(state, state, state, feed, "cust")
    }
    intercept[IllegalArgumentException] { // feed on a state slot
      IncrementalView.joinFeed(feed, feed, state, feed, "cust")
    }
    intercept[IllegalArgumentException] { // non-key columns collide
      val feedV = Seq((1L, 2L)).toDF("cust", "v")
        .withColumn("_change_type", lit("insert"))
      IncrementalView.joinFeed(feedV, Seq((1L, 9L)).toDF("cust", "v"),
        Seq((1L, 2L)).toDF("cust", "v"), feedV, "cust")
    }
  }

  test("readAtOverlapping prunes to the changed keys' files") {
    val (r, _) = mkJoin()
    // 4 range-partitioned files over cust 0..9 with cust stats: a probe
    // for one key must open fewer files than the table holds
    val all = TxTable.filesAt(spark, r, 1L)
    val slice = TxTable.readAtOverlapping(spark, r, 1L, "cust",
      Seq(0L).toDF("cust"))
    val opened = slice.inputFiles.length
    assert(opened < all.size, s"pruned read opened $opened of ${all.size}")
    // pruning never changes which ROWS qualify after the row filter
    assert(slice.filter($"cust" === 0L).count() ==
      TxTable.readAt(spark, r, 1L).filter($"cust" === 0L).count())
  }
}
