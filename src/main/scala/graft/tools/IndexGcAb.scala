package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{AnnIndex, MarginIndex, Similarity, VecIndex}
import graft.sink.TxTable

/** Index-table GC probe at fleet cadence (VERDICT r11 item 4): LogGcAb
  * proved the LogStore loop bounded over 1,000 cycles; the three index
  * families churn the same way — every append adds files (margin
  * appends also REWRITE displaced partitions, whose replaced
  * predecessors only `TxTable.vacuum` reclaims), and an unmaintained
  * year would show up as unbounded on-disk growth or listing/pruning
  * walls. This probe runs `cycles` append → compact-if-needed →
  * vacuum cycles against a live VecIndex AND a live MarginIndex and
  * reports, every 100 cycles:
  *
  *  - VISIBLE data files (what pruning considers) and TOTAL on-disk
  *    parquet files + bytes (what a listing and the disk actually pay
  *    — retired-but-unvacuumed files live in the gap),
  *  - cumulative reclaimed files/bytes from vacuum,
  *  - the probedFiles (commit-log pruning) wall and a fixed 10-query
  *    search wall — the flatness invariant,
  *  - at every 250th cycle, q243/q244-CLASS PARITY: at-rest search ≡
  *    the full in-session run over the grown corpus at the frozen
  *    codebooks (symmetric difference must be 0) — GC must never
  *    change an answer.
  *
  * Appends are exact corpus twins under fresh ids (in-distribution:
  * the drift signal must stay silent — asserted at the end). Vacuum
  * runs with minAgeMs = 0: a single-process probe has no in-flight
  * readers (the grace window's correctness is the hostile spec's job).
  *
  * `runMain graft.tools.IndexGcAb [cycles=1000] [vacuumEvery=10]
  * [marginCycles=cycles] [srcDir=/root/testdata/sf0.01]` — the source
  * dir moves the probe up a data decade (r13 item 8: sf0.1 puts 10×
  * the rows per cell, so compaction and vacuum move real bytes).
  */
object IndexGcAb {
  def main(args: Array[String]): Unit = {
    val cycles = args.headOption.map(_.toInt).getOrElse(1000)
    val vacuumEvery = args.lift(1).map(_.toInt).getOrElse(10)
    val marginCycles = args.lift(2).map(_.toInt).getOrElse(cycles)
    val srcDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = graft.sources.Tables.load(spark, srcDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val base = emb.localCheckpoint(true)
    val nBase = base.count()
    val queries = base.filter(col("vec_id") <= 9)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))
      .localCheckpoint(true)

    def onDisk(table: String): (Long, Long) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(walk)
        else Seq(f)
      val fs = walk(new java.io.File(table)).filter(_.getName.endsWith(".parquet"))
      (fs.size.toLong, fs.map(_.length()).sum)
    }

    /** One family's churn loop; returns (parityFailures, reclaimedFiles). */
    def churn(tag: String, table: String, nCycles: Int,
              append: DataFrame => Unit,
              searchNow: () => DataFrame,
              parityNow: DataFrame => DataFrame): (Int, Long) = {
      var reclaimedFiles = 0L
      var reclaimedBytes = 0L
      var parityFails = 0
      val t0 = System.nanoTime()
      (1 to nCycles).foreach { i =>
        // 5 exact corpus twins under fresh, monotone ids
        val batch = base.filter(pmod(col("vec_id") + lit(i), lit(nBase)) < 5)
          .limit(5)
          .select((col("vec_id") + lit(10000000L + i.toLong * 100L)).as("vec_id"),
            col("embedding"))
        append(batch)
        AnnIndex.compactIfNeeded(spark, table, maxFilesPerList = 3.0)
        if (i % vacuumEvery == 0) {
          val (fB, bB) = onDisk(table)
          val got = TxTable.vacuum(spark, table, minAgeMs = 0L)
          val (fA, bA) = onDisk(table)
          reclaimedFiles += got.size
          reclaimedBytes += (bB - bA) max 0L
          require(fB - fA <= got.size + 8,
            s"$tag vacuum accounting: disk dropped ${fB - fA}, reported ${got.size}")
          // sidecar GC (the round-12 fix: vacuum no longer touches
          // metadata — drift stats/stale metas have their own reaper)
          reclaimedFiles += AnnIndex.vacuumSidecars(spark, table,
            keepDrift = 64, minAgeMs = 0L).size
        }
        if (i % 100 == 0) {
          val visible = TxTable.currentFiles(spark, table).size
          val (diskF, diskB) = onDisk(table)
          // top-level entries = data dirs + sidecars + log dir: the
          // sidecar-boundedness axis (drift stats grow one per append
          // without the reaper)
          val topEntries = new java.io.File(table).listFiles().length
          val tP = System.nanoTime()
          val pf = AnnIndex.probedFiles(spark, table, Set(0L, 1L, 2L))
          val pruneS = (System.nanoTime() - tP) / 1e9
          val tS = System.nanoTime()
          val rows = searchNow().count()
          val searchS = (System.nanoTime() - tS) / 1e9
          println(f"[idxgc:$tag] cycle $i%5d: visible=$visible%4d " +
            f"top=$topEntries%4d disk=${diskF}%5d files/${diskB / 1048576}%4d MiB " +
            f"probed=${pf.size}%3d prune=$pruneS%5.2f s search=$searchS%5.2f s " +
            f"rows=$rows%4d reclaimed=$reclaimedFiles%5d/${reclaimedBytes / 1048576}%4d MiB " +
            f"elapsed=${(System.nanoTime() - t0) / 1e9}%7.1f s")
        }
        if (i % 250 == 0) {
          val atRest = searchNow().localCheckpoint(true)
          val inSession = parityNow(grownCorpus(table)).localCheckpoint(true)
          val diff = atRest.exceptAll(inSession)
            .union(inSession.exceptAll(atRest)).count()
          if (diff != 0) parityFails += 1
          println(f"[idxgc:$tag] cycle $i%5d: PARITY diff=$diff (must be 0)")
        }
      }
      (parityFails, reclaimedFiles)
    }

    /** The grown corpus reconstructed from the index's own data rows —
      * the in-session parity leg's input.
      */
    def grownCorpus(table: String): DataFrame =
      TxTable.read(spark, table).filter(col("cn").isNotNull)
        .select(col("id").as("vec_id"), col("v").as("embedding"))
        .localCheckpoint(true)

    // ---- VecIndex loop
    val vecDir = java.nio.file.Files.createTempDirectory("graft_idxgc_vec")
      .toString + "/idx"
    VecIndex.build(spark, base, vecDir, kPerHalf = 4, iters = 0)
    val vMeta = VecIndex.readMeta(spark, vecDir)
    val (vFail, vReclaimed) = churn("vec", vecDir, cycles,
      b => { VecIndex.append(spark, b, vecDir); () },
      () => VecIndex.search(spark, vecDir, queries, k = 10),
      grown => Similarity.ivfTopKImi(queries, grown, k = 10, kPerHalf = 4,
        codebooksOpt = Some((vMeta.cb1, vMeta.cb2))))
    val vDrift = AnnIndex.rebuildWarranted(spark, vecDir)
    println(s"[idxgc:vec] parityFails=$vFail reclaimed=$vReclaimed " +
      s"rebuildWarranted=$vDrift (twin appends must stay silent)")

    // ---- MarginIndex loop
    val mDir = java.nio.file.Files.createTempDirectory("graft_idxgc_margin")
      .toString + "/idx"
    MarginIndex.build(spark, base, mDir, kPerHalf = 4, nProbe = 8)
    val mMeta = MarginIndex.readMeta(spark, mDir)
    val (mFail, mReclaimed) = churn("margin", mDir, marginCycles,
      b => { MarginIndex.append(spark, b, mDir); () },
      () => MarginIndex.search(spark, mDir, queries, k = 5),
      grown => Similarity.marginTopKImi(queries, grown, k = 5, kPerHalf = 4,
        nProbe = 8, codebooksOpt = Some((mMeta.cb1, mMeta.cb2))))
    println(s"[idxgc:margin] parityFails=$mFail reclaimed=$mReclaimed")
    require(vFail == 0 && mFail == 0, "GC must never change an answer")
    require(!vDrift, "in-distribution twin appends must not ring the " +
      "rebuild alarm (the minBatchRows gate — r12 review: this was " +
      "printed but never asserted)")
    spark.stop()
  }
}
