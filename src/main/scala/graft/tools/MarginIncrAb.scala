package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Margin-index incremental maintenance probe (VERDICT r10 item 2):
  * the r10 index was rebuild-only, so a daily-refresh alignment
  * pipeline paid the full train + assign + self-kNN build per batch
  * (211.5 s-class at 100×); [[graft.functions.MarginIndex.append]]
  * repairs only the a-means a batch invalidates. The claim to measure:
  * refresh cost ∝ touched neighborhood (batch cells + affected rows'
  * probe cells), NOT corpus. This probe:
  *
  *  1. builds once on 99% of the deck (derived geometry) — the
  *     rebuild-per-batch cost an operator would otherwise pay,
  *  2. appends the held-out 1% in five 0.2% batches, per append
  *     reporting wall, files rewritten vs kept (the touched-partition
  *     footprint), and a fixed 10-query search wall after it,
  *  3. prints the rebuild:append ratio — the steady-state win.
  *
  * Run over ImiScaleAb/SemDedupIncrAb `gen` decks:
  * `runMain graft.tools.MarginIncrAb <dir> [mod=500]` (expects
  * embeddings.parquet). The optional holdout MODULUS decides what the
  * appends measure: the replica offset is 1,000,000 ≡ 0 (mod 500), so
  * the default holds out whole rotation-twin CLASSES — batch rows have
  * no standing twins, standing kth-kept cosines are twin-saturated,
  * and the run measures the assignment + screen FLOOR (rewrote = 0 at
  * saturated decks by construction, SCALE.md r12). 1,000,000 ≡ 4
  * (mod 501), so `mod = 501` SPLITS every twin class across residues —
  * each batch row is a genuine fresh near-neighbor of standing rows
  * and the run measures REAL displacement repair (VERDICT r12 → r13
  * item 2; pair with a jittered deck so twin cosines sit below 1.0).
  */
object MarginIncrAb {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val mod = args.lift(1).map(_.toInt).getOrElse(500)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("MINCR_SHUFFLE", "32").toInt)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val corpus = emb.filter(col("vec_id") % mod >= 5)
    val idx = java.nio.file.Files.createTempDirectory("graft_mincr")
      .toString + "/idx"
    var t0 = System.nanoTime()
    graft.functions.MarginIndex.build(spark, corpus, idx)
    val buildS = (System.nanoTime() - t0) / 1e9
    println(f"[mincr] build(${corpus.count()}%,d rows) once: $buildS%.1f s")
    val queries = emb.filter(col("vec_id") % mod >= 5 && col("vec_id") <= 20)
      .select(col("vec_id").as("query_id"), col("embedding").as("query_vec"))

    var appendTotal = 0.0
    (0 until 5).foreach { i =>
      val batch = emb.filter(col("vec_id") % mod === i)
      val before = graft.sink.TxTable.currentFiles(spark, idx).toSet
      t0 = System.nanoTime()
      graft.functions.MarginIndex.append(spark, batch, idx)
      val w = (System.nanoTime() - t0) / 1e9
      appendTotal += w
      val after = graft.sink.TxTable.currentFiles(spark, idx).toSet
      t0 = System.nanoTime()
      val rows = graft.functions.MarginIndex.search(spark, idx, queries, k = 5).count()
      val sW = (System.nanoTime() - t0) / 1e9
      println(f"[mincr] append $i (${batch.count()}%,d rows): $w%6.1f s " +
        f"rewrote=${(before -- after).size}%3d kept=${(before & after).size}%4d " +
        f"added=${(after -- before).size}%3d search=$sW%5.2f s rows=$rows")
    }
    println(f"[mincr] rebuild-per-batch would cost ~$buildS%.1f s x5 = ${buildS * 5}%.1f s; " +
      f"incremental appends cost $appendTotal%.1f s (${buildS * 5 / appendTotal}%.1fx)")

    // the ∝-touched-cells axis, isolated: a CONCENTRATED batch (twins
    // of rows from ONE cell — identical vectors land in the same cell)
    // touches only that cell's probe neighborhood, where the uniform
    // batches above scatter over ~every cell and the affected set
    // approaches the corpus (the honest worst case). The delta between
    // these two walls IS the locality term.
    val oneCell = graft.sink.TxTable.read(spark, idx)
      .filter(col("cn").isNotNull)
      .filter(col("cid") === col("cid")) // force a concrete read below
    val topCell = oneCell.groupBy(col("cid")).count()
      .orderBy(col("count").desc).first().get(0).toString.toLong
    val concentrated = oneCell.filter(col("cid") === topCell)
      .select((col("id") + 90000000L).as("vec_id"),
        col("v").as("embedding")).limit(400)
    val before = graft.sink.TxTable.currentFiles(spark, idx).toSet
    t0 = System.nanoTime()
    graft.functions.MarginIndex.append(spark, concentrated, idx)
    val wC = (System.nanoTime() - t0) / 1e9
    val after = graft.sink.TxTable.currentFiles(spark, idx).toSet
    println(f"[mincr] concentrated append (${concentrated.count()}%,d rows, 1 cell): " +
      f"$wC%6.1f s rewrote=${(before -- after).size} kept=${(before & after).size}")
    spark.stop()
  }
}
