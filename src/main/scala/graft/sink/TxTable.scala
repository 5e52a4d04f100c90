package graft.sink

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit, when}

/** Minimal transactional table: a versioned commit log over parquet —
  * the smallest useful form of the Delta/Iceberg core idea, built to
  * close the rename-swap crash windows VERDICT r2 flagged in
  * Compaction/upsert (and the lost-update window of plain appends).
  *
  * Layout:
  * {{{
  *   table/
  *     batch-<uuid>/part-*.parquet      data files (INVISIBLE until committed)
  *     _graft_txn/00000001.json         one JSON commit per version
  * }}}
  *
  * Every commit lists files `added` and files `removed` (table-relative
  * paths). The CURRENT table state = replay of all commits in version
  * order. Writers stage data files first — readers never see them — then
  * publish with ONE filesystem operation: a rename of the commit JSON
  * into `_graft_txn/<next-version>.json` (racing writers are resolved by
  * a per-table JVM lock plus no-replace-rename detection — see
  * [[commit]] for the exact guarantees per layer; conflict-checked
  * commits throw rather than replay a stale file set). There is NO
  * window where the table is missing or doubled: a crash before the
  * commit rename leaves only orphan data files (cleaned by `vacuum`),
  * never a corrupted table.
  *
  * At 100 TB this also fixes read-side planning: the file list comes
  * from the log (a few KB per commit), not a recursive directory LIST —
  * the operation that dominates planning latency on object stores.
  *
  * WRITE-side scope: commit publication is delegated to a pluggable
  * [[CommitCoordinator]] whose one primitive is `putIfAbsent` on the
  * version-addressed commit path. The default
  * [[RenameCommitCoordinator]] (temp + no-replace rename + exists
  * guard) is correct on local FS (with the per-table JVM lock) and
  * HDFS; raw S3A rename is copy+delete AND replaces the destination, so
  * an S3 deployment plugs in a conditional-put coordinator
  * (`If-None-Match: *`) instead — the same LogStore/commit-coordinator
  * seam Delta Lake uses there. The no-replace-rename assumption is thus
  * an implementation of the seam, not a protocol limit; the
  * racing-writer spec drives both in-tree coordinators. READ-side
  * planning from the log is safe on any store.
  *
  * Read planning is CHECKPOINTED: every `checkpointEvery` commits the
  * live file set snapshots to `<version>.ckpt`, and replay is snapshot +
  * commit suffix — O(interval) opens however old the table is, so a
  * commit-per-micro-batch stream can run for months without planning
  * degradation. [[vacuum]] reclaims the replay-redundant log prefix.
  *
  * Deliberately out of scope (this is parity engineering, not a table
  * format): schema evolution in the log, multi-table transactions,
  * time travel past the latest checkpoint once the log is cleaned.
  */
object TxTable {

  private def logDir(table: String) = s"$table/_graft_txn"

  private def fsFor(spark: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Recursively delete a whole table/fixture directory. Gate and
    * bench fixtures use this to reclaim their temp trees after the
    * result is materialized — NOT a table operation (no log, no
    * grace window); for in-place reclamation of dead files use
    * [[vacuum]].
    */
  def deleteDir(spark: SparkSession, path: String): Unit = {
    fsFor(spark, path).delete(new Path(path), true); ()
  }

  /** Per-file column statistic: `typ` is L (long), D (double) or S
    * (string/ISO-timestamp — lexicographically ordered), `lo`/`hi` the
    * min/max rendered as strings. Stats ride in the commit (and
    * checkpoint) JSON so selective reads can skip files WITHOUT opening
    * them — the read-side win that makes the log a real table format.
    */
  final case class ColStat(col: String, typ: String, lo: String, hi: String)

  /** Synthetic per-file ROW-COUNT stat (`lo` = `hi` = the count), added
    * by [[fileStats]] alongside every requested column: commit-log-only
    * consumers (list-occupancy drift, compaction sizing) read row
    * volumes without touching data files. The `#` prefix can never
    * collide with a real column, and pruning ignores it (stats are
    * looked up by the pruned column's name).
    */
  val RowCountStat: String = "#rows"

  final case class Commit(version: Long, added: Seq[String], removed: Seq[String],
                          stats: Seq[Seq[ColStat]] = Nil,
                          txn: Option[(String, Long)] = None) {
    require(stats.isEmpty || stats.size == added.size,
      s"stats must align with added (${stats.size} vs ${added.size})")
  }

  /** Snapshot of the LIVE file set as of `version` — replay shortcut.
    * Written every `checkpointEvery` commits so read planning opens one
    * snapshot + a bounded commit suffix instead of every JSON since v1
    * (a commit-per-micro-batch stream would otherwise grow planning
    * without bound — the exact failure the log exists to prevent).
    */
  final case class Checkpoint(version: Long, live: Seq[String],
                              stats: Seq[Seq[ColStat]] = Nil,
                              txns: Seq[(String, Long)] = Nil) {
    require(stats.isEmpty || stats.size == live.size,
      s"stats must align with live (${stats.size} vs ${live.size})")
  }

  // ----------------------------------------------------------- log replay

  private val CommitName = """^(\d{8})\.json$""".r
  private val CkptName = """^(\d{8})\.ckpt$""".r

  /** One listing → (commit files, checkpoint files), each (version, path)
    * in version order. Every read-side decision derives from this single
    * LIST — no per-version exists() probing.
    */
  private def listLog(fs: FileSystem, table: String): (Seq[(Long, Path)], Seq[(Long, Path)]) = {
    val dir = new Path(logDir(table))
    if (!fs.exists(dir)) return (Nil, Nil)
    val names = fs.listStatus(dir).toSeq.map(_.getPath)
    val cs = names.flatMap(p => p.getName match {
      case CommitName(v) => Some(v.toLong -> p); case _ => None
    }).sortBy(_._1)
    val ks = names.flatMap(p => p.getName match {
      case CkptName(v) => Some(v.toLong -> p); case _ => None
    }).sortBy(_._1)
    (cs, ks)
  }

  private def slurp(fs: FileSystem, p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Retained commits in version order (missing log → empty). After
    * [[vacuum]] log cleaning this is the suffix since the last
    * checkpoint, not necessarily full history — state reconstruction
    * must go through [[currentFiles]], which folds the checkpoint in.
    */
  def commits(spark: SparkSession, table: String): Seq[Commit] = {
    val fs = fsFor(spark, table)
    listLog(fs, table)._1.map { case (_, p) => parse(slurp(fs, p)) }
  }

  /** (head version, live (file, stats) entries): latest checkpoint +
    * commit-suffix replay. FS opens are 1 checkpoint + (commits since
    * it) — bounded by `checkpointEvery` regardless of table age.
    */
  private def currentFull(fs: FileSystem, table: String)
      : (Long, Seq[(String, Seq[ColStat])], Map[String, Long]) = {
    val (cs, ks) = listLog(fs, table)
    val base = ks.lastOption.map { case (_, p) => parseCkpt(slurp(fs, p)) }
    val baseV = base.map(_.version).getOrElse(0L)
    val suffix = cs.filter(_._1 > baseV).map { case (_, p) => parse(slurp(fs, p)) }
    val live = scala.collection.mutable.LinkedHashMap[String, Seq[ColStat]]()
    def fold(files: Seq[String], stats: Seq[Seq[ColStat]], removed: Seq[String]): Unit = {
      val st = if (stats.isEmpty) files.map(_ => Seq.empty[ColStat]) else stats
      files.zip(st).foreach { case (f, s) => live(f) = s }
      removed.foreach(live.remove)
    }
    // writer-txn watermarks survive log cleaning through the checkpoint,
    // exactly like the live set — idempotence memory must not expire
    val txns = scala.collection.mutable.LinkedHashMap[String, Long]()
    base.foreach { k =>
      fold(k.live, k.stats, Nil)
      k.txns.foreach { case (a, v) => txns(a) = math.max(v, txns.getOrElse(a, Long.MinValue)) }
    }
    suffix.foreach { c =>
      fold(c.added, c.stats, c.removed)
      c.txn.foreach { case (a, v) => txns(a) = math.max(v, txns.getOrElse(a, Long.MinValue)) }
    }
    val head = (baseV +: cs.map(_._1)).max
    (head, live.toSeq, txns.toMap)
  }

  private def currentEntries(fs: FileSystem, table: String): (Long, Seq[(String, Seq[ColStat])]) = {
    val (h, e, _) = currentFull(fs, table)
    (h, e)
  }

  private def currentState(fs: FileSystem, table: String): (Long, Seq[String]) = {
    val (h, e) = currentEntries(fs, table)
    (h, e.map(_._1))
  }

  /** Live file set after replaying the log (table-relative paths). */
  def currentFiles(spark: SparkSession, table: String): Seq[String] =
    currentState(fsFor(spark, table), table)._2

  /** Live files with their per-file column stats (empty per file when the
    * committing writer collected none).
    */
  def currentFilesWithStats(spark: SparkSession, table: String): Seq[(String, Seq[ColStat])] =
    currentEntries(fsFor(spark, table), table)._2

  /** Read the committed state. Planning comes from the log — uncommitted
    * staging files are invisible by construction.
    */
  def read(spark: SparkSession, table: String): DataFrame =
    readFiles(spark, table, currentFiles(spark, table))

  // --------------------------------------------------------- time travel

  /** File set as of historical `version` — replay from the newest
    * checkpoint at-or-below it plus the commit suffix up to it. The
    * contiguity `require` catches BOTH holes: commits cleaned by
    * [[vacuum]]'s log cleaning (target predates the earliest usable
    * checkpoint) and a corrupt/partial log. version 0 = the empty table.
    */
  def filesAt(spark: SparkSession, table: String, version: Long): Seq[String] = {
    require(version >= 0, s"version must be >= 0, got $version")
    if (version == 0) return Nil
    val fs = fsFor(spark, table)
    val (cs, ks) = listLog(fs, table)
    val head = (0L +: cs.map(_._1) ++: ks.map(_._1)).max
    require(version <= head, s"version $version is past head $head of $table")
    ks.filter(_._1 == version).lastOption match {
      case Some((_, p)) => parseCkpt(slurp(fs, p)).live // exact snapshot
      case None =>
        val base = ks.filter(_._1 < version).lastOption
          .map { case (_, p) => parseCkpt(slurp(fs, p)) }
        val baseV = base.map(_.version).getOrElse(0L)
        val suffix = cs.filter(t => t._1 > baseV && t._1 <= version)
          .map { case (_, p) => parse(slurp(fs, p)) }
        require(suffix.map(_.version) == (baseV + 1 to version),
          s"cannot reconstruct version $version of $table: commits " +
            s"(${baseV + 1}..$version] are not contiguous in the log " +
            "(cleaned by vacuum, or corrupt)")
        val live = scala.collection.mutable.LinkedHashSet[String]()
        base.foreach(live ++= _.live)
        suffix.foreach { c => live ++= c.added; live --= c.removed.toSet }
        live.toSeq
    }
  }

  /** Time travel: the table exactly as of `version`. Data-file GC caveat
    * (same as any log-structured format): [[vacuum]] deletes
    * compacted-away files after the grace window, so travel to a version
    * whose files were vacuumed fails AT READ with missing files — the
    * log can only promise versions younger than the vacuum horizon.
    */
  def readAt(spark: SparkSession, table: String, version: Long): DataFrame =
    readFiles(spark, table, filesAt(spark, table, version))

  /** [[filesAt]] with each file's committed column stats — the planning
    * input for [[readAtOverlapping]]. Same checkpoint replay and
    * contiguity rules; stats fold exactly like the live set does in
    * [[currentFull]] (a file's stats are fixed at its adding commit).
    */
  private def entriesAt(fs: FileSystem, table: String,
                        version: Long): Seq[(String, Seq[ColStat])] = {
    require(version >= 0, s"version must be >= 0, got $version")
    if (version == 0) return Nil
    val (cs, ks) = listLog(fs, table)
    val head = (0L +: cs.map(_._1) ++: ks.map(_._1)).max
    require(version <= head, s"version $version is past head $head of $table")
    val live = scala.collection.mutable.LinkedHashMap[String, Seq[ColStat]]()
    def fold(files: Seq[String], stats: Seq[Seq[ColStat]],
             removed: Seq[String]): Unit = {
      val st = if (stats.isEmpty) files.map(_ => Seq.empty[ColStat]) else stats
      files.zip(st).foreach { case (f, s) => live(f) = s }
      removed.foreach(live.remove)
    }
    ks.filter(_._1 == version).lastOption match {
      case Some((_, p)) =>
        val k = parseCkpt(slurp(fs, p)); fold(k.live, k.stats, Nil)
      case None =>
        val base = ks.filter(_._1 < version).lastOption
          .map { case (_, p) => parseCkpt(slurp(fs, p)) }
        val baseV = base.map(_.version).getOrElse(0L)
        val suffix = cs.filter(t => t._1 > baseV && t._1 <= version)
          .map { case (_, p) => parse(slurp(fs, p)) }
        require(suffix.map(_.version) == (baseV + 1 to version),
          s"cannot reconstruct version $version of $table: commits " +
            s"(${baseV + 1}..$version] are not contiguous in the log " +
            "(cleaned by vacuum, or corrupt)")
        base.foreach(k => fold(k.live, k.stats, Nil))
        suffix.foreach(c => fold(c.added, c.stats, c.removed))
    }
    live.toSeq
  }

  /** Time travel pruned to the files whose committed `key` [min, max]
    * overlaps the distinct values of `keys`' first column — the
    * "re-read only the affected slice of a historical version" primitive
    * (incremental view maintenance reads `R_old ⋈ ΔS` this way: the old
    * fact slice for the handful of changed dimension keys, never the
    * whole historical fact table). Pruning changes which files OPEN,
    * never which rows qualify — callers still apply the row-level join
    * or filter. Files committed without stats for `key` are always read
    * (no proof their rows miss — the same keep-by-default rule as
    * [[merge]]'s touch set). Null keys are dropped, matching the inner
    * equi-join semantics every caller applies on top.
    */
  def readAtOverlapping(spark: SparkSession, table: String, version: Long,
                        key: String, keys: DataFrame): DataFrame = {
    val fs = fsFor(spark, table)
    val keysDf = keys.select(keys.columns.head).na.drop().distinct()
      .toDF("__k").select(col("__k").cast("string").as("__k"))
    val touched = overlappingFiles(spark, entriesAt(fs, table, version), keysDf, key)
    if (touched.isEmpty) {
      val all = filesAt(spark, table, version)
      if (all.isEmpty) spark.emptyDataFrame
      else readFiles(spark, table, all).limit(0) // keep the schema
    } else readFiles(spark, table, touched)
  }

  /** Current head version (0 = never committed). */
  def headVersion(spark: SparkSession, table: String): Long =
    currentState(fsFor(spark, table), table)._1

  // ---------------------------------------------------------- change feed

  /** File-level diff between two versions: (files added, files removed)
    * going from `fromVersion` to `toVersion` — the planning input for
    * [[readChanges]]. Both sides reconstruct through [[filesAt]], so the
    * same checkpoint/vacuum contiguity rules apply.
    */
  def changedFiles(spark: SparkSession, table: String,
                   fromVersion: Long, toVersion: Long): (Seq[String], Seq[String]) = {
    require(fromVersion <= toVersion,
      s"fromVersion $fromVersion must be <= toVersion $toVersion")
    val before = filesAt(spark, table, fromVersion)
    val after = filesAt(spark, table, toVersion)
    val beforeSet = before.toSet
    val afterSet = after.toSet
    (after.filterNot(beforeSet), before.filterNot(afterSet))
  }

  /** Change-data-feed: the NET row-level changes between `fromVersion`
    * (exclusive) and `toVersion` (inclusive), as the table's columns plus
    * a `_change_type` column (`insert` | `delete`). An updated row (e.g.
    * from [[merge]]) surfaces as its old image tagged `delete` plus its
    * new image tagged `insert` — the classic CDF shape a downstream
    * incremental consumer (sync to a search index, re-embed changed
    * docs, refresh a derived table) applies directly.
    *
    * Derivation is file diff + multiset cancellation: only the files
    * ADDED or REMOVED across the version range are read (never the whole
    * table — at 100 TB an incremental day's changes cost the day's
    * files), and `exceptAll` in both directions cancels rows that were
    * merely REWRITTEN unchanged. That cancellation is what makes the
    * feed semantic rather than physical: [[compact]]/Z-order rewrites
    * net to exactly zero changes, and a [[merge]] touching a 5M-row file
    * to update 100 rows yields 100 deletes + 100 inserts, not 5M of
    * each. The cost of cancellation is one all-column shuffle over the
    * touched-file rows — bounded by the diff, not the table.
    *
    * Multiset semantics: legitimately duplicate rows are counted — a row
    * going from 3 occurrences to 1 yields 2 `delete` rows. Rows are
    * compared on the ALIGNED schema (cross-version schema evolution
    * fills missing columns with null via the same `unionByName` rule as
    * [[readFiles]]); a column added with all-null values therefore does
    * NOT flag untouched rows as changed. Data-file GC caveat as
    * [[readAt]]: both versions must be younger than the vacuum horizon.
    */
  def readChanges(spark: SparkSession, table: String,
                  fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val (addedF, removedF) = changedFiles(spark, table, fromVersion, toVersion)
    def tag(df: DataFrame, t: String): DataFrame =
      df.withColumn("_change_type", lit(t))
    if (addedF.isEmpty && removedF.isEmpty)
      return tag(readFiles(spark, table, filesAt(spark, table, toVersion)), "insert")
        .limit(0)
    if (removedF.isEmpty) return tag(readFiles(spark, table, addedF), "insert")
    if (addedF.isEmpty) return tag(readFiles(spark, table, removedF), "delete")
    val addDf = readFiles(spark, table, addedF, mergeSchema = true)
    val remDf = readFiles(spark, table, removedF, mergeSchema = true)
    // align both sides to one column set/order before exceptAll (which
    // is positional): each side gains the other's missing columns as
    // nulls through the zero-row unionByName, then the removed side is
    // projected into the added side's column order
    val addAligned = addDf.unionByName(remDf.limit(0), allowMissingColumns = true)
    val remAligned = remDf.unionByName(addDf.limit(0), allowMissingColumns = true)
      .select(addAligned.columns.map(col).toIndexedSeq: _*)
    tag(addAligned.exceptAll(remAligned), "insert")
      .unionByName(tag(remAligned.exceptAll(addAligned), "delete"))
  }

  /** Read an explicit table-relative file list (committed, staged, or a
    * mix — the validation-before-commit read). Files are grouped by batch
    * dir and each group reads with its own `basePath`, so Hive partition
    * dirs nested inside a batch dir (batch-x/col=value/part.parquet)
    * resolve without tripping partition-discovery's conflicting-structures
    * check (partition dirs sit BELOW the batch level, which a single
    * table-rooted basePath can't express). Batches then
    * `unionByName(allowMissingColumns)` — which is also the
    * schema-evolution merge across commits. Partition pruning applies per
    * union child; [[compact]] bounds the union width.
    */
  def readFiles(spark: SparkSession, table: String, files: Seq[String],
                mergeSchema: Boolean = false): DataFrame = {
    if (files.isEmpty) return spark.emptyDataFrame
    // preserve the CALLER's order (currentFiles = commit order), not the
    // random batch-uuid sort: the union's column order follows the first
    // batch, and a schema that flaps across equivalent histories breaks
    // positional consumers
    val grouped = files.groupBy(_.split("/", 2)(0))
    files.map(_.split("/", 2)(0)).distinct
      .map { batch =>
        // NO per-file schema merging inside a batch: every file in a
        // batch dir came from ONE stageBatch write and shares its
        // schema, so `mergeSchema` here only spawned a distributed
        // footer-merge job per read (measured: half the lifecycle
        // fixture's job count). Cross-batch schema evolution — the case
        // `mergeSchema` exists for — is handled structurally by the
        // unionByName below.
        spark.read
          .option("basePath", s"$table/$batch")
          .parquet(grouped(batch).map(f => s"$table/$f"): _*)
      }
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  // -------------------------------------------------------------- writers

  /** Transactional append: stage a batch directory, then publish it with
    * one commit. With `statsCols`, per-file min/max of those columns ride
    * in the commit and [[readPruned]] can skip files at plan time.
    * Returns the committed version.
    */
  def append(spark: SparkSession, df: DataFrame, table: String,
             statsCols: Seq[String] = Nil): Long = {
    val files = stage(spark, df, table)
    val stats =
      if (statsCols.isEmpty) Nil else fileStats(spark, table, files, statsCols)
    commit(spark, table, added = files, removed = Nil, stats = stats)
  }

  /** Latest writer version the log records for `appId` (None if the app
    * has never committed). The retried-writer resume point: a restarted
    * job reads this and continues from the next un-landed batch.
    */
  def txnVersion(spark: SparkSession, table: String, appId: String): Option[Long] =
    currentFull(fsFor(spark, table), table)._3.get(appId)

  /** Idempotent append — exactly-once under writer retries. The commit
    * records `(appId, writerVersion)`; a re-run of an already-landed
    * (appId, writerVersion) SKIPS (returns None, stages nothing durable)
    * instead of double-appending. `writerVersion` is the writer's own
    * monotone sequence (micro-batch id, chunk number, attempt epoch) —
    * the guard is `>=`, so versions must not be reused for different
    * data. This is the sink half of end-to-end exactly-once for a
    * retried loader or a `foreachBatch` stream (reference behavior:
    * ingest re-runs dedup by re-querying run logs,
    * datalakeingestion utils/incremental_data_load.py — here the sink
    * itself refuses the duplicate).
    *
    * The skip check runs both BEFORE staging (cheap fast path: no data
    * write at all for an obvious duplicate) and atomically inside the
    * commit loop (the race-proof slow path — two concurrent retries of
    * the same batch land exactly one commit); a skip detected only at
    * commit time cleans up its staged files.
    */
  def appendOnce(spark: SparkSession, df: DataFrame, table: String,
                 appId: String, writerVersion: Long,
                 statsCols: Seq[String] = Nil): Option[Long] = {
    require(writerVersion >= 0, s"writerVersion must be >= 0, got $writerVersion")
    if (txnVersion(spark, table, appId).exists(_ >= writerVersion)) return None
    val files = stage(spark, df, table)
    val stats =
      if (statsCols.isEmpty) Nil else fileStats(spark, table, files, statsCols)
    val out = commitOpt(spark, table, added = files, removed = Nil,
      stats = stats, txn = Some((appId, writerVersion)))
    if (out.isEmpty) deleteStaged(spark, table, files)
    out
  }

  /** Per-file min/max of `cols` over freshly staged files — one grouped
    * aggregate job over the batch (which the writer just produced, so
    * it's hot). Column types map to the stat domains: integers → L,
    * float/double → D, string/date/timestamp → S (rendered through
    * Spark's string cast; ISO forms compare lexicographically). Files a
    * stat can't be derived for (all-null column, unmatchable listing
    * entry) get NO stat — the pruning default is "keep", so missing
    * stats cost opens, never rows.
    */
  def fileStats(spark: SparkSession, table: String, files: Seq[String],
                cols: Seq[String]): Seq[Seq[ColStat]] = {
    import org.apache.spark.sql.functions.{input_file_name, max, min}
    import org.apache.spark.sql.types._
    if (files.isEmpty || cols.isEmpty) return files.map(_ => Seq.empty[ColStat])
    val df = readFiles(spark, table, files)
    val typed = cols.filter(df.columns.contains).flatMap { c =>
      df.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType => Some(c -> "L")
        case FloatType | DoubleType => Some(c -> "D")
        case StringType | DateType | TimestampType | TimestampNTZType => Some(c -> "S")
        case _ => None // unorderable/exotic: no stat, file always kept
      }
    }
    if (typed.isEmpty) return files.map(_ => Seq.empty[ColStat])
    val aggs = typed.flatMap { case (c, t) =>
      val base = if (t == "S") col(c).cast("string") else col(c)
      Seq(min(base).as(s"__lo_$c"), max(base).as(s"__hi_$c"))
    } :+ org.apache.spark.sql.functions.count(
      org.apache.spark.sql.functions.lit(1)).as("__nrows")
    val rows = df.groupBy(input_file_name().as("__file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    files.map { f =>
      rows.find(_.getString(0).endsWith(f)) match {
        case None => Seq.empty[ColStat] // listing/URI mismatch: keep-safe
        case Some(r) =>
          val n = r.getLong(1 + 2 * typed.size).toString
          typed.zipWithIndex.flatMap { case ((c, t), i) =>
            val (lo, hi) = (r.get(1 + 2 * i), r.get(2 + 2 * i))
            if (lo == null || hi == null) None // all-null column in file
            else Some(ColStat(c, t, lo.toString, hi.toString))
          } :+ ColStat(RowCountStat, "L", n, n)
      }
    }
  }

  // ------------------------------------------- relational listing (scale)

  /** Conf key: JSON-checkpoint byte size past which set-membership
    * pruning ([[prunedFilesIn]]) plans RELATIONALLY from the parquet
    * files-checkpoint instead of materializing every live file's stats
    * on the driver. Default 8 MiB ≈ low-millions of files; at the IMI
    * ceiling decade the listing is ~GBs (SCALE.md r12 math), where the
    * driver Seq is the wall the relational path removes.
    */
  val RelationalListingBytesKey = "spark.graft.relationalListingBytes"
  private val RelationalListingBytesDefault: Long = 8L * 1024 * 1024

  private val FilesCkptName = """^(\d{8})\.files$""".r
  private def listFilesCkpts(fs: FileSystem, table: String): Seq[(Long, Path)] = {
    val dir = new Path(logDir(table))
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq.map(_.getPath).flatMap(p => p.getName match {
      case FilesCkptName(v) => Some(v.toLong -> p); case _ => None
    }).sortBy(_._1)
  }

  private val EntriesSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("f", org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("scol", org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("styp", org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("lo", org.apache.spark.sql.types.StringType, nullable = true),
    org.apache.spark.sql.types.StructField("hi", org.apache.spark.sql.types.StringType, nullable = true)))

  private def entriesToDF(spark: SparkSession,
                          entries: Seq[(String, Seq[ColStat])]): DataFrame = {
    import org.apache.spark.sql.Row
    // long form: one PRESENCE row (scol null) per file — a file's
    // membership never depends on it having stats — plus one row per
    // stat, so ANY stat column prunes relationally, not just cid
    val rows = entries.flatMap { case (f, stats) =>
      Row(f, null, null, null, null) +:
        stats.map(st => Row(f, st.col, st.typ, st.lo, st.hi))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows,
        math.max(1, rows.size / 2000000 + 1)), EntriesSchema)
  }

  /** Snapshot the live (file, stats) entries as a PARQUET relation at
    * `_graft_txn/<version>.files/` — the commit-log listing an executor
    * job can PRUNE (row groups sorted by (scol, lo); predicate pushdown
    * on the stat column) instead of the driver scanning it. Best-effort
    * like the JSON checkpoint: content is a deterministic function of
    * the log at `version`, so a lost write or racer costs nothing.
    * The entries are in hand at checkpoint time (the JSON checkpoint
    * materializes them anyway); once a table outgrows the JSON render
    * itself, the successor derives `<v+k>.files` from `<v>.files` MINUS
    * the suffix's removals PLUS its additions — pure DataFrame algebra,
    * no driver materialization (the recorded next seam, SCALE.md r13).
    */
  private def writeFilesCheckpoint(spark: SparkSession, table: String,
                                   version: Long,
                                   entries: Seq[(String, Seq[ColStat])]): Unit =
    try {
      val fs = fsFor(spark, table)
      val target = new Path(f"${logDir(table)}/$version%08d.files")
      if (fs.exists(target)) return // a racer's content is identical
      val tmp = new Path(
        s"${logDir(table)}/.tmpfiles-${java.util.UUID.randomUUID().toString.take(8)}")
      entriesToDF(spark, entries)
        .sortWithinPartitions("scol", "lo")
        .write.mode("overwrite").option("compression", "snappy")
        .parquet(tmp.toString)
      if (!fs.rename(tmp, target)) fs.delete(tmp, true)
    } catch { case _: Exception => () /* acceleration only */ }

  /** The live (file, stats) entries as a DataFrame — `(f, scol, styp,
    * lo, hi)` long form — planned from the newest parquet
    * files-checkpoint plus the commit SUFFIX folded driver-side (the
    * suffix is bounded by the checkpoint cadence; the base relation is
    * never materialized on the driver). None when no parquet checkpoint
    * exists or the suffix is non-contiguous (log cleaned past the
    * parquet's version after a lost best-effort write) — callers fall
    * back to the driver path, which is always correct.
    */
  def liveEntriesDF(spark: SparkSession, table: String): Option[DataFrame] = {
    val fs = fsFor(spark, table)
    listFilesCkpts(fs, table).lastOption.flatMap { case (v, p) =>
      val (cs, _) = listLog(fs, table)
      val suffixIdx = cs.filter(_._1 > v)
      val head = (v +: suffixIdx.map(_._1)).max
      if (suffixIdx.map(_._1) != (v + 1 to head)) None
      else scala.util.Try {
        val suffix = suffixIdx.map { case (_, cp) => parse(slurp(fs, cp)) }
        val delta = scala.collection.mutable.LinkedHashMap[String, Seq[ColStat]]()
        val gone = scala.collection.mutable.LinkedHashSet[String]()
        suffix.foreach { c =>
          val st = if (c.stats.isEmpty) c.added.map(_ => Seq.empty[ColStat])
            else c.stats
          c.added.zip(st).foreach { case (f, s) => delta(f) = s; gone -= f }
          c.removed.foreach { f => delta.remove(f); gone += f }
        }
        val base = spark.read.schema(EntriesSchema).parquet(p.toString)
        if (delta.isEmpty && gone.isEmpty) base
        else {
          import org.apache.spark.sql.functions.broadcast
          val excluded = entriesToDF(spark,
            (delta.keys ++ gone).toSeq.map(_ -> Seq.empty[ColStat]))
            .select(col("f"))
          base.join(broadcast(excluded), Seq("f"), "left_anti")
            .unionByName(entriesToDF(spark, delta.toSeq))
        }
      }.toOption
    }
  }

  /** Files whose `statCol` stat MAY hold one of `wanted` (set
    * membership — the index families' probed-cell pruning). Stat-less
    * files are kept (missing stats cost opens, never rows). Two plans,
    * same result set:
    *
    *  - DRIVER (small tables): scan [[currentFilesWithStats]] — one
    *    hash lookup per Hive-statted file (lo == hi), a range test
    *    otherwise.
    *  - RELATIONAL (past [[RelationalListingBytesKey]]): prune the
    *    parquet files-checkpoint as an executor job and collect only
    *    the MATCHED paths — driver memory ∝ |result|, not ∝ |files|,
    *    which is what survives the decade where the listing itself is
    *    ~GBs (the fourth-decade wall named by SCALE.md r12).
    */
  /** The shared relational-dispatch half of [[prunedFilesIn]] and
    * [[prunedFiles]]: None below the size threshold or without a
    * parquet files-checkpoint (callers run the driver scan, always
    * correct); otherwise the pruned file set, where `hitsOf` maps the
    * `statCol` stat rows to the matching ones and stat-less files are
    * always kept (missing stats cost opens, never rows).
    */
  private def relationalPruneOpt(spark: SparkSession, table: String,
                                 statCol: String,
                                 hitsOf: DataFrame => DataFrame): Option[Seq[String]] = {
    val fs = fsFor(spark, table)
    val thr = scala.util.Try(
        spark.conf.get(RelationalListingBytesKey).toLong)
      .getOrElse(RelationalListingBytesDefault)
    val big = listLog(fs, table)._2.lastOption.exists { case (_, p) =>
      scala.util.Try(fs.getFileStatus(p).getLen).getOrElse(0L) >= thr
    }
    if (!big) None
    else liveEntriesDF(spark, table).map { live =>
      val statRows = live.filter(col("scol") === statCol)
      val hits = hitsOf(statRows).select(col("f"))
      val statless = live.filter(col("scol").isNull).select(col("f"))
        .join(statRows.select(col("f")).distinct(), Seq("f"), "left_anti")
      hits.unionByName(statless)
        .distinct().sort("f")
        .collect().map(_.getString(0)).toSeq
    }
  }

  def prunedFilesIn(spark: SparkSession, table: String, statCol: String,
                    wanted: Set[Long]): Seq[String] = {
    val relational = relationalPruneOpt(spark, table, statCol, statRows => {
      import org.apache.spark.sql.functions.broadcast
      val wantedStr = wanted.map(_.toString).toSeq
      // Hive layout (lo == hi): sargable string-equality IN — parquet
      // row-group pruning does the work. Range-statted files (legacy
      // or multi-cell) go through a broadcast semi-join on the cast.
      val eqHits = statRows
        .filter(col("lo") === col("hi") && col("lo").isin(wantedStr: _*))
        .select(col("f"))
      val wantedDF = {
        import spark.implicits._
        wanted.toSeq.toDF("__pc")
      }
      val rngHits = statRows.filter(col("lo") =!= col("hi"))
        .join(broadcast(wantedDF),
          col("lo").cast("long") <= col("__pc") &&
            col("__pc") <= col("hi").cast("long"), "left_semi")
        .select(col("f"))
      eqHits.unionByName(rngHits)
    })
    relational.getOrElse {
      currentFilesWithStats(spark, table).collect {
        case (f, stats) if stats.find(_.col == statCol).forall { st =>
          val (lo, hi) = (st.lo.toLong, st.hi.toLong)
          if (lo == hi) wanted.contains(lo)
          else wanted.exists(c => lo <= c && c <= hi)
        } => f
      }
    }
  }

  /** Files that MAY hold rows with `colName` in [lo, hi] (inclusive;
    * None = unbounded): a file is skipped only when its committed stats
    * prove the range misses it. Files without a stat for `colName` are
    * always kept. Bounds are strings in the stat domain (numbers render
    * plainly, timestamps as Spark's string cast). Range semantics only:
    * stats ignore NULLs, exactly like the range predicate does.
    */
  def prunedFiles(spark: SparkSession, table: String, colName: String,
                  lo: Option[String], hi: Option[String]): Seq[String] = {
    // RELATIONAL dispatch past the listing threshold (the incremental
    // watermark-read twin of [[prunedFilesIn]]'s probed-cell pruning —
    // ingestion tables hit the same fourth-decade listing wall): the
    // typed [min, max]-overlap test runs as a stat-typ-dispatched
    // Column predicate over the parquet files-checkpoint. "S" stats
    // (strings/ISO timestamps) compare lexicographically in both plans.
    val relational = relationalPruneOpt(spark, table, colName, statRows => {
      def leq(a: Column, b: Column): Column =
        when(col("styp") === "L", a.cast("long") <= b.cast("long"))
          .when(col("styp") === "D", a.cast("double") <= b.cast("double"))
          .otherwise(a <= b)
      val keepHi = hi.map(h => leq(col("lo"), lit(h))).getOrElse(lit(true))
      val keepLo = lo.map(l => leq(lit(l), col("hi"))).getOrElse(lit(true))
      statRows.filter(keepHi && keepLo)
    })
    relational.getOrElse {
      def cmp(typ: String, a: String, b: String): Int = typ match {
        case "L" => java.lang.Long.compare(a.toLong, b.toLong)
        case "D" => java.lang.Double.compare(a.toDouble, b.toDouble)
        case _ => a.compareTo(b)
      }
      currentFilesWithStats(spark, table).collect {
        case (f, stats) if stats.find(_.col == colName).forall { st =>
          hi.forall(h => cmp(st.typ, st.lo, h) <= 0) &&
            lo.forall(l => cmp(st.typ, st.hi, l) >= 0)
        } => f
      }
    }
  }

  /** Plan-time file skipping from committed stats: read only the files
    * whose [min, max] overlaps [lo, hi]. The caller still applies the
    * row-level filter — pruning changes which files OPEN, never which
    * rows qualify.
    */
  def readPruned(spark: SparkSession, table: String, colName: String,
                 lo: Option[String], hi: Option[String]): DataFrame =
    readFiles(spark, table, prunedFiles(spark, table, colName, lo, hi))

  /** Transactional full overwrite: one commit swaps the entire file set —
    * the atomic replacement the rename-swap pattern approximates, with no
    * missing-table window. Conflict-checked: if another commit lands
    * between reading the state and publishing, this THROWS
    * `ConcurrentModificationException` instead of silently resurrecting
    * the concurrently-written files (retrying with a stale removed-list
    * would merge two "full" states into a doubled table).
    */
  def overwrite(spark: SparkSession, df: DataFrame, table: String): Long = {
    val (head, live) = currentState(fsFor(spark, table), table)
    val files = stage(spark, df, table)
    commit(spark, table, added = files, removed = live, expectedHead = Some(head))
  }

  /** [[overwrite]] with [[appendOnce]]'s writer-txn idempotence — the
    * derived-table refresh shape: a replayed refresh of an
    * already-folded writer version skips (staged files cleaned) instead
    * of clobbering newer state, so a crash-replay loop cannot
    * double-apply or rewind a refresh.
    */
  def overwriteOnce(spark: SparkSession, df: DataFrame, table: String,
                    appId: String, writerVersion: Long): Option[Long] = {
    require(writerVersion >= 0, s"writerVersion must be >= 0, got $writerVersion")
    if (txnVersion(spark, table, appId).exists(_ >= writerVersion)) return None
    val (head, live) = currentState(fsFor(spark, table), table)
    val files = stage(spark, df, table)
    val out = commitOpt(spark, table, added = files, removed = live,
      expectedHead = Some(head), txn = Some((appId, writerVersion)))
    if (out.isEmpty) deleteStaged(spark, table, files)
    out
  }

  /** Transactional compaction: rewrite the current state at a target file
    * granularity and swap file sets in one commit. A crash at ANY point
    * leaves either the old state (no commit yet) or the new (commit
    * renamed) — never neither, unlike the `.__precompact` rename dance.
    */
  /** Stats-pruned partial-rewrite MERGE (the Delta-style batch upsert):
    * rewrite ONLY the files whose committed `key` min/max range overlaps
    * the update batch's key range — every other file survives the commit
    * untouched. This is what makes upsert viable at 100 TB: a day's
    * update batch against a key-clustered table touches the handful of
    * files its keys land in, not the table (the full-table
    * read-union-overwrite alternative is the streaming upsert's shape,
    * correct but O(table) per batch).
    *
    * Semantics per key: the update row wins unconditionally over the
    * base row (an explicit precedence column — NOT an orderCols tie,
    * which `max_by` would break arbitrarily); among duplicate update
    * keys, last-writer-wins by `orderCols`. Insert keys (no base match)
    * land in the rewrite. Null update keys are the caller's bug — they
    * merge into one null group like any groupBy.
    *
    * Files without a committed stat for `key` are conservatively
    * rewritten (pruning default "keep" — missing stats cost rewrites,
    * never correctness). Pair with `compact(clusterBy = key)` so file
    * ranges are disjoint and tight. Conflict-checked like overwrite:
    * a commit landing between the state read and the publish throws
    * rather than resurrecting or double-applying files.
    */
  /** Files whose committed `key` [min, max] range contains SOME key of
    * `keysDf` (single `__k` string column) — per-file set overlap, not
    * one envelope over the whole batch (an envelope would rewrite the
    * table for one low key plus one high insert). The file-range table
    * is bounded metadata (#files rows), broadcast against the distinct
    * keys; the join yields touched FILES, so the collect is bounded by
    * #files. Stat-less files are always returned: no proof their keys
    * miss the batch (pruning default "keep" — costs rewrites, never
    * correctness).
    */
  private def overlappingFiles(spark: SparkSession,
                               entries: Seq[(String, Seq[ColStat])],
                               keysDf: DataFrame, key: String): Seq[String] = {
    import org.apache.spark.sql.functions.broadcast
    val withStat = entries.flatMap { case (f, ss) =>
      ss.find(_.col == key).map(st => (f, st))
    }
    val noStat = entries.map(_._1).filterNot(withStat.map(_._1).toSet)
    val overlapped = withStat.headOption match {
      case None => Nil
      case Some((_, st0)) =>
        val castT: Column => Column = st0.typ match {
          case "L" => _.cast("long")
          case "D" => _.cast("double")
          case _ => (c: Column) => c
        }
        val ranges = spark.createDataFrame(
            withStat.map { case (f, st) => (f, st.lo, st.hi) })
          .toDF("__f", "__lo", "__hi")
        keysDf.join(broadcast(ranges),
            castT(col("__k")).between(castT(col("__lo")), castT(col("__hi"))))
          .select(col("__f")).distinct().collect().map(_.getString(0)).toSeq
    }
    (noStat ++ overlapped).distinct
  }

  def merge(spark: SparkSession, updates: DataFrame, table: String,
            key: String, orderCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.lit
    val fs = fsFor(spark, table)
    val (head, entries) = currentEntries(fs, table)
    val keysDf = updates.select(col(key).cast("string").as("__k"))
      .na.drop().distinct()
    if (keysDf.isEmpty) return head // empty/all-null-key batch: no-op
    val touched = overlappingFiles(spark, entries, keysDf, key)
    val upd = updates.toDF().withColumn("__prio", lit(1))
    val combined =
      if (touched.isEmpty) upd
      else readFiles(spark, table, touched, mergeSchema = true)
        .withColumn("__prio", lit(0)).unionByName(upd)
    val merged = graft.operators.LatestRowView.latestPerKey(
        combined, Seq(key), col("__prio") +: orderCols.map(col))
      .drop("__prio")
    val files = stageBatch(spark, merged, table)
    // stats survive the merge for every column any live file tracks,
    // plus the merge key itself (the next merge needs it)
    val statCols = (entries.flatMap(_._2.map(_.col)) :+ key).distinct
    val stats = fileStats(spark, table, files, statCols)
    commit(spark, table, added = files, removed = touched,
      expectedHead = Some(head), stats = stats)
  }

  /** Stats-pruned key DELETE (the GDPR/right-to-erasure primitive):
    * remove every row whose `key` appears in `keys`, rewriting ONLY the
    * files whose committed key range overlaps the delete set — the same
    * per-file touch discipline as [[merge]], so deleting a user's rows
    * from a key-clustered 100 TB table costs the handful of files that
    * user lands in. Touched files are rewritten through a broadcast
    * anti-join; a file whose every row matches simply contributes
    * nothing (a commit may remove more files than it adds). Null keys
    * in `keys` are dropped — SQL `NOT IN` null semantics would delete
    * nothing, and an erasure request for "null" is a caller bug either
    * way. Conflict-checked like overwrite.
    */
  def delete(spark: SparkSession, keys: DataFrame, table: String,
             key: String): Long = {
    import org.apache.spark.sql.functions.broadcast
    val fs = fsFor(spark, table)
    val (head, entries) = currentEntries(fs, table)
    val keysDf = keys.select(keys.columns.head).na.drop().distinct()
      .toDF("__k").select(col("__k").cast("string").as("__k"))
    if (keysDf.isEmpty) return head
    val touched = overlappingFiles(spark, entries, keysDf, key)
    if (touched.isEmpty) return head
    val survivors = readFiles(spark, table, touched, mergeSchema = true)
      .join(broadcast(keysDf), col(key).cast("string") === col("__k"),
        "left_anti")
    val files = stageBatch(spark, survivors, table)
    val statCols = (entries.flatMap(_._2.map(_.col)) :+ key).distinct
    val stats = fileStats(spark, table, files, statCols)
    commit(spark, table, added = files, removed = touched,
      expectedHead = Some(head), stats = stats)
  }

  /** Size-tiered fold for APPEND-ONLY relations that grow forever (the
    * verdict audit log: one row per admitted vector, ∝ corpus by
    * design): rewrite ONLY the current files still below
    * `targetRowsPerFile` — per the commit log's [[RowCountStat]], zero
    * data IO to plan; stat-less files count as small (they get folded
    * and gain stats) — into at most the files their row sum needs.
    * MATURE files are never rewritten, so at fleet cadence the
    * amortized maintenance cost per tick is O(batch), not O(corpus):
    * a full [[compact]] of a ceiling-decade verdict table (~270 GB,
    * SCALE.md r13 math) every `maxVerdictFiles` ticks would otherwise
    * re-shuffle the whole audit history forever (VERDICT r12 → r13
    * item 7). Returns -1 when fewer than `minFilesToFold` small files
    * exist (nothing worth a commit). Conflict-checked like compact.
    */
  def foldSmallFiles(spark: SparkSession, table: String,
                     targetRowsPerFile: Long = 5000000L,
                     minFilesToFold: Int = 2): Long = {
    val (head, entries) = currentEntries(fsFor(spark, table), table)
    val small = entries.filter { case (_, stats) =>
      stats.find(_.col == RowCountStat).forall(_.lo.toLong < targetRowsPerFile)
    }
    if (small.size < minFilesToFold) return -1L
    val before = small.map(_._1)
    val df = readFiles(spark, table, before, mergeSchema = true)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    val files = stageBatch(spark, df.repartition(nFiles), table)
    val statCols = entries.flatMap(_._2.map(_.col)).distinct
    val stats =
      if (statCols.isEmpty) Nil else fileStats(spark, table, files, statCols)
    commit(spark, table, added = files, removed = before,
      expectedHead = Some(head), stats = stats)
  }

  def compact(spark: SparkSession, table: String,
              targetRowsPerFile: Long = 5000000L,
              clusterBy: Option[String] = None,
              partitionBy: Seq[String] = Nil): Long = {
    val (head, entries) = currentEntries(fsFor(spark, table), table)
    val before = entries.map(_._1)
    if (before.isEmpty) return -1L
    // readFiles, NOT a raw parquet read: Hive partition columns nested in
    // batch dirs and schema-evolved columns must survive the rewrite — a
    // plain leaf-file read would silently drop them from the table
    val df = readFiles(spark, table, before, mergeSchema = true)
    val rows = df.count()
    val nFiles = math.max(1L, (rows + targetRowsPerFile - 1) / targetRowsPerFile).toInt
    // clusterBy without Hive partitioning → RANGE repartition, so each
    // compacted file owns a disjoint slice of the cluster column: that's
    // what makes the recomputed file stats (below) and parquet row-group
    // stats actually prune. With Hive partitioning the shuffle key must
    // stay the partition columns (one dir per value); clusterBy then
    // only sorts within files.
    val cluster = clusterBy.filter(df.columns.contains)
    val repart = (partitionBy, cluster) match {
      case (ps, _) if ps.nonEmpty => df.repartition(nFiles, ps.map(col): _*)
      case (_, Some(c)) => df.repartitionByRange(nFiles, col(c))
      case _ => df.repartition(nFiles)
    }
    val clustered = cluster.map(c => repart.sortWithinPartitions(c)).getOrElse(repart)
    // pass partitionBy to keep the Hive layout (directory pruning);
    // without it, former partition columns persist as data columns
    val files = stageBatch(spark, clustered, table, partitionBy = partitionBy)
    // stats survive compaction: recompute per-file min/max for the UNION
    // of columns any pre-compact file carried stats for (compacting a
    // stat-bearing table must not silently turn off its pruning).
    // clusterBy makes the recomputed stats tight again — sorted files
    // have near-disjoint ranges, which is the read-side win.
    val statCols = entries.flatMap(_._2.map(_.col)).distinct
    val stats =
      if (statCols.isEmpty) Nil else fileStats(spark, table, files, statCols)
    // conflict-checked like overwrite: compacting a state that moved on
    // would remove files a concurrent commit still expects
    commit(spark, table, added = files, removed = before,
      expectedHead = Some(head), stats = stats)
  }

  /** Snapshot clone: publish `src`'s state at `version` (0 = head) as
    * commit v1 of a NEW table at `dst` — the Delta SHALLOW CLONE shape.
    * Data files are HARDLINKED when both sides are on a local POSIX
    * filesystem (zero-copy, O(files) metadata ops; the linked inodes
    * keep the clone readable even after the source compacts and vacuums
    * the originals away) and byte-copied otherwise (HDFS/object stores;
    * a reference-only clone would need absolute URIs in commits, and
    * TxTable deliberately keeps table-relative refs so vacuum/compact
    * stay closed over the table dir). Per-file column stats ride along,
    * so pruned reads work on the clone unchanged. After the clone the
    * two tables are fully independent: append/delete/compact/vacuum on
    * either never touches the other.
    *
    * 100 TB shape: no data pass at all on local/posix (links) and one
    * distributed-copy-free sequential copy otherwise; the commit is one
    * JSON rename either way. Cloning a petabyte table is a metadata
    * operation, which is the entire point.
    */
  def cloneAt(spark: SparkSession, src: String, dst: String,
              version: Long = 0L): Long = {
    val sfs = fsFor(spark, src)
    val dfs = fsFor(spark, dst)
    require(headVersion(spark, dst) == 0L, s"clone target $dst is not empty")
    val v = if (version == 0L) headVersion(spark, src) else version
    require(v > 0L, s"clone source $src has no committed version")
    val entries = entriesAt(sfs, src, v)
    val batch = "batch-clone-" + java.util.UUID.randomUUID().toString.take(12)
    dfs.mkdirs(new Path(s"$dst/$batch"))
    val added = entries.map { case (rel, _) =>
      val flat = rel.replace("/", "__")
      val from = sfs.makeQualified(new Path(s"$src/$rel"))
      val to = dfs.makeQualified(new Path(s"$dst/$batch/$flat"))
      val linked =
        if (from.toUri.getScheme == "file" && to.toUri.getScheme == "file")
          try {
            java.nio.file.Files.createLink(
              java.nio.file.Paths.get(to.toUri), java.nio.file.Paths.get(from.toUri))
            true
          } catch { case _: UnsupportedOperationException | _: java.io.IOException => false }
        else false
      if (!linked)
        org.apache.hadoop.fs.FileUtil.copy(sfs, from, dfs, to, false,
          spark.sparkContext.hadoopConfiguration)
      s"$batch/$flat"
    }
    commit(spark, dst, added = added, removed = Nil, stats = entries.map(_._2))
  }

  /** Metadata-only RESTORE: make `toVersion`'s content the new head
    * WITHOUT copying any data — the restore commit adds back exactly
    * the files of `toVersion` that the current head dropped and removes
    * exactly the head files `toVersion` lacks (Delta's RESTORE
    * semantics). History is preserved: time travel still reads every
    * intermediate version, and the restore is itself just another
    * commit (optimistic-concurrency checked against the head it saw).
    * [[vacuum]] keeps the re-referenced files — they are reachable from
    * the new head. Per-file column stats ride along, so pruned reads
    * keep working on the restored head.
    */
  def restore(spark: SparkSession, table: String, toVersion: Long): Long = {
    val fs = fsFor(spark, table)
    val head = headVersion(spark, table)
    require(toVersion >= 1L && toVersion <= head,
      s"restore target v$toVersion outside [1, $head]")
    val target = entriesAt(fs, table, toVersion)
    val current = entriesAt(fs, table, head)
    val targetSet = target.map(_._1).toSet
    val curSet = current.map(_._1).toSet
    val added = target.filterNot(e => curSet.contains(e._1))
    val removed = current.map(_._1).filterNot(targetSet.contains)
    commit(spark, table, added = added.map(_._1), removed = removed,
      expectedHead = Some(head), stats = added.map(_._2))
  }

  /** Delete data files no commit path can reach (crash orphans and
    * compacted-away files). `minAgeMs` is the reader/writer grace window
    * and applies to BOTH classes: staged-but-uncommitted batches younger
    * than it are kept (an in-flight writer isn't vacuumed mid-commit),
    * and compacted-away files younger than it are kept (a reader that
    * planned against the pre-compact version can still finish). Run with
    * minAgeMs larger than the longest expected query/commit.
    */
  def vacuum(spark: SparkSession, table: String, minAgeMs: Long = 3600000L): Seq[String] = {
    val fs = fsFor(spark, table)
    val root = new Path(table)
    if (!fs.exists(root)) return Nil
    val live = currentFiles(spark, table).toSet
    val cutoff = System.currentTimeMillis() - minAgeMs
    // qualify before relativizing: listFiles returns scheme-qualified
    // paths and URI.relativize refuses mixed absolute/relative forms
    val qRoot = fs.makeQualified(root)
    val it = fs.listFiles(qRoot, true)
    val deleted = scala.collection.mutable.ListBuffer[String]()
    while (it.hasNext) {
      val st = it.next()
      val rel = qRoot.toUri.relativize(st.getPath.toUri).getPath
      val isLog = rel.startsWith("_graft_txn")
      // `_graft_*` table METADATA (index meta/drift sidecars and their
      // `._graft_*.tmp` staging) is NOT vacuum's domain: sidecars are
      // content-addressed and referenced through commit STATS, not the
      // live-file set, so the !live test would reap a LIVE index's
      // codebooks (round-12 IndexGcAb finding — the first fleet-cadence
      // vacuum destroyed the VecIndex meta). Their own GC with the
      // right liveness rule is [[graft.functions.AnnIndex.vacuumSidecars]].
      val name = st.getPath.getName
      val isSidecar = name.startsWith("_graft_") || name.startsWith("._graft_")
      // anything else not in the live set — crash orphans AND removed-
      // by-compaction files — is reclaimable once past the grace window
      // (no time travel in the minimal form)
      val dead = !isLog && !isSidecar && !live(rel) && st.getModificationTime < cutoff
      if (dead && fs.delete(st.getPath, false)) deleted += rel
    }
    // retired batch/partition dirs: deleting a dir's last file leaves
    // an EMPTY directory forever — at fleet cadence that is one
    // abandoned `batch-*` dir per append, unbounded (IndexGcAb, round
    // 12: +1 top-level entry per cycle). Reap aged empty dirs
    // bottom-up, never the root or the log dir. A dir emptied by the
    // pass above carries a fresh mtime (unlink updates it), so the
    // grace window keeps in-flight stagers safe; the non-recursive
    // delete re-checks emptiness atomically.
    def subDirs(p: Path): Seq[Path] = {
      val kids = fs.listStatus(p).filter(_.isDirectory).map(_.getPath)
      kids.flatMap(subDirs) ++ kids
    }
    subDirs(qRoot).foreach { d =>
      val rel = qRoot.toUri.relativize(d.toUri).getPath
      // A lost race — a cross-process writer landing a file between
      // listStatus and delete — is NOT a soft `false` on every
      // FileSystem: RawLocalFileSystem and HDFS throw
      // (PathIsNotEmptyDirectory)IOException on a non-recursive delete
      // of a non-empty dir, and getFileStatus throws if a concurrent
      // vacuum already reaped it. Either way the right outcome is
      // "dir kept / already gone, keep sweeping", never aborting the
      // whole vacuum pass mid-run.
      val reaped = !rel.startsWith("_graft_txn") && scala.util.Try {
        fs.getFileStatus(d).getModificationTime < cutoff &&
          fs.listStatus(d).isEmpty && fs.delete(d, false)
      }.getOrElse(false)
      if (reaped) deleted += rel
    }
    // log cleaning: commits at versions ≤ the latest checkpoint (and
    // older checkpoints) are replay-redundant — the snapshot carries
    // their net effect. Same grace window: a reader that listed the log
    // before the checkpoint landed can still finish its replay.
    val (cs, ks) = listLog(fs, table)
    ks.lastOption.foreach { case (ckptV, _) =>
      (cs.filter(_._1 <= ckptV) ++ ks.dropRight(1)).foreach { case (_, p) =>
        if (fs.getFileStatus(p).getModificationTime < cutoff && fs.delete(p, false))
          deleted += s"_graft_txn/${p.getName}"
      }
    }
    // superseded parquet files-checkpoints: keep the newest (the
    // relational-listing base), reap older ones past the grace window
    listFilesCkpts(fs, table).dropRight(1).foreach { case (_, p) =>
      val reaped = scala.util.Try {
        fs.getFileStatus(p).getModificationTime < cutoff && fs.delete(p, true)
      }.getOrElse(false)
      if (reaped) deleted += s"_graft_txn/${p.getName}"
    }
    deleted.toList
  }

  // ------------------------------------------------------------ internals

  private def stage(spark: SparkSession, df: DataFrame, table: String): Seq[String] =
    stageBatch(spark, df, table)

  /** Write `df` into a fresh staging batch dir WITHOUT committing; return
    * the table-relative parquet paths (nested under partition dirs when
    * `partitionBy` is set). Nothing is visible to readers until the paths
    * are passed to [[commit]]; an aborted batch is reclaimed with
    * [[deleteStaged]] (or eventually by [[vacuum]] after a crash).
    * This stage/validate/commit split is what gives IngestionRun
    * commit-or-nothing loads with no rollback machinery.
    */
  def stageBatch(spark: SparkSession, df: DataFrame, table: String,
                 partitionBy: Seq[String] = Nil,
                 maxRecordsPerFile: Long = 0L): Seq[String] = {
    val batch = "batch-" + java.util.UUID.randomUUID().toString.take(12)
    val w0 = df.write.option("compression", "snappy")
    val w1 = if (maxRecordsPerFile > 0) w0.option("maxRecordsPerFile", maxRecordsPerFile) else w0
    (if (partitionBy.nonEmpty) w1.partitionBy(partitionBy: _*) else w1)
      .parquet(s"$table/$batch")
    val fs = fsFor(spark, table)
    val qBatch = fs.makeQualified(new Path(s"$table/$batch"))
    val it = fs.listFiles(qBatch, true)
    val out = scala.collection.mutable.ListBuffer[String]()
    while (it.hasNext) {
      val p = it.next().getPath
      if (p.getName.endsWith(".parquet"))
        out += s"$batch/${qBatch.toUri.relativize(p.toUri).getPath}"
    }
    out.toList.sorted
  }

  /** Drop an uncommitted staged batch (the abort path). Only whole batch
    * dirs are removed, derived from the staged file list.
    */
  def deleteStaged(spark: SparkSession, table: String, staged: Seq[String]): Unit = {
    val fs = fsFor(spark, table)
    staged.map(_.split("/", 2)(0)).distinct
      .foreach(b => fs.delete(new Path(s"$table/$b"), true))
  }

  /** Publish one commit: write JSON to a temp name, then rename into the
    * next version slot.
    *
    * Concurrency, by layer:
    *  - same JVM: a per-table lock serializes version-select + publish —
    *    necessary because LOCAL filesystem rename is POSIX rename(2),
    *    which silently REPLACES an existing destination (two lock-free
    *    local racers could both "win" a version and one commit would
    *    vanish; HDFS rename returns false instead).
    *  - cross process (HDFS/stores with no-replace rename): a lost race
    *    surfaces as rename→false; a pure APPEND (expectedHead = None)
    *    re-reads the head and retries, a conflict-checked commit
    *    (overwrite/compact) throws ConcurrentModificationException —
    *    its staged removed-set is stale and must be rebuilt, not
    *    replayed. Cross-PROCESS writers on a plain local FS are outside
    *    the guarantee (same caveat as LogStore's JVM-wide lock).
    */
  def commit(spark: SparkSession, table: String,
             added: Seq[String], removed: Seq[String],
             expectedHead: Option[Long] = None,
             checkpointEvery: Int = 10,
             stats: Seq[Seq[ColStat]] = Nil,
             coordinator: CommitCoordinator = RenameCommitCoordinator): Long =
    commitOpt(spark, table, added, removed, expectedHead, checkpointEvery,
      stats, coordinator, txn = None)
      .getOrElse(throw new IllegalStateException(
        "unreachable: a txn-less commit never skips"))

  /** [[commit]] with [[appendOnce]]'s writer-txn idempotence, for
    * callers that stage their OWN batches (partitioned layouts like
    * [[graft.functions.AnnIndex]], which needs `stageBatch(partitionBy)`
    * rather than appendOnce's flat staging): returns None — publishing
    * nothing — when the log already records `appId` at a writer version
    * >= `writerVersion`. On a skip the STAGED FILES ARE THE CALLER'S to
    * reclaim ([[deleteStaged]]), exactly as appendOnce does internally.
    */
  def commitOnce(spark: SparkSession, table: String,
                 added: Seq[String], removed: Seq[String],
                 appId: String, writerVersion: Long,
                 stats: Seq[Seq[ColStat]] = Nil,
                 expectedHead: Option[Long] = None): Option[Long] = {
    require(writerVersion >= 0, s"writerVersion must be >= 0, got $writerVersion")
    commitOpt(spark, table, added, removed, expectedHead = expectedHead,
      stats = stats, txn = Some((appId, writerVersion)))
  }

  /** [[commit]] plus writer-transaction idempotence: with `txn =
    * Some((appId, writerVersion))`, the commit is SKIPPED (returns None,
    * publishes nothing) when the log already records `appId` at a
    * writer version >= `writerVersion`. The check runs inside the
    * version-select/publish loop: a racer landing the same txn first
    * costs us one putIfAbsent miss, after which the re-read sees its
    * watermark and we skip — the commit-or-skip decision is atomic with
    * publication, which is what makes a retried writer exactly-once
    * rather than at-least-once (the Delta `txn` action's contract).
    */
  private[sink] def commitOpt(spark: SparkSession, table: String,
             added: Seq[String], removed: Seq[String],
             expectedHead: Option[Long] = None,
             checkpointEvery: Int = 10,
             stats: Seq[Seq[ColStat]] = Nil,
             coordinator: CommitCoordinator = RenameCommitCoordinator,
             txn: Option[(String, Long)] = None): Option[Long] =
    lockFor(table).synchronized {
      val fs = fsFor(spark, table)
      fs.mkdirs(new Path(logDir(table)))
      var attempt = 1
      while (true) {
        // head from ONE name listing — no per-commit opens in the hot path
        val (cs, ks) = listLog(fs, table)
        val head = (0L +: (cs.map(_._1) ++ ks.map(_._1))).max
        expectedHead.filter(_ != head).foreach { e =>
          throw new java.util.ConcurrentModificationException(
            s"$table advanced to v$head (expected v$e): restage against the current state")
        }
        val version = head + 1L
        val target = new Path(f"${logDir(table)}/$version%08d.json")
        // read the prior live set BEFORE publishing (checkpoint versions
        // only): if our publish wins, the log at `version` is exactly
        // (prior state + this commit) — no racer can slot in below us
        val wantCkpt = checkpointEvery > 0 && version % checkpointEvery == 0
        val prior = if (wantCkpt || txn.isDefined) Some(currentFull(fs, table)) else None
        txn.foreach { case (app, wv) =>
          if (prior.exists(_._3.get(app).exists(_ >= wv))) return None
        }
        val bytes = render(Commit(version, added, removed, stats, txn)).getBytes("UTF-8")
        if (coordinator.putIfAbsent(fs, target, bytes)) {
          if (wantCkpt) prior.foreach { case (_, priorLive, priorTxns) =>
            val live = scala.collection.mutable.LinkedHashMap[String, Seq[ColStat]]()
            priorLive.foreach { case (f, s) => live(f) = s }
            val st = if (stats.isEmpty) added.map(_ => Seq.empty[ColStat]) else stats
            added.zip(st).foreach { case (f, s) => live(f) = s }
            removed.foreach(live.remove)
            val allTxns = scala.collection.mutable.LinkedHashMap[String, Long]()
            priorTxns.foreach { case (a, v) => allTxns(a) = v }
            txn.foreach { case (a, v) =>
              allTxns(a) = math.max(v, allTxns.getOrElse(a, Long.MinValue)) }
            writeCheckpoint(fs, table,
              Checkpoint(version, live.keys.toSeq, live.values.toSeq, allTxns.toSeq))
            // parquet twin of the live set, for relational listing —
            // same entries, already in hand, best-effort like the JSON
            writeFilesCheckpoint(spark, table, version, live.toSeq)
          }
          return Some(version)
        }
        // lost a cross-process race (coordinator cleaned up its own temp)
        if (expectedHead.isDefined)
          throw new java.util.ConcurrentModificationException(
            s"$table: lost commit race at v$version with a stale file set")
        if (attempt >= 5)
          throw new java.io.IOException(s"$table: commit race persisted for $attempt attempts")
        Thread.sleep(50L * attempt)
        attempt += 1
      }
      throw new IllegalStateException("unreachable")
    }

  /** Snapshot the live set to `<version>.ckpt`. Best-effort: the
    * checkpoint is pure replay acceleration — its content is a
    * deterministic function of the log at `version`, so a lost write (or
    * a racer writing the same version) costs opens, never correctness.
    */
  private def writeCheckpoint(fs: FileSystem, table: String, ckpt: Checkpoint): Unit =
    try {
      val target = new Path(f"${logDir(table)}/${ckpt.version}%08d.ckpt")
      val tmp = new Path(s"${logDir(table)}/.tmp-${java.util.UUID.randomUUID().toString.take(8)}")
      val out = fs.create(tmp, false)
      try out.write(renderCkpt(ckpt).getBytes("UTF-8"))
      finally out.close()
      if (!fs.rename(tmp, target)) fs.delete(tmp, false)
    } catch { case _: Exception => () /* acceleration only */ }

  private val tableLocks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(table: String): Object =
    tableLocks.computeIfAbsent(table, _ => new Object)

  // Hand-rolled (de)serialization: no JSON lib on the offline classpath.
  // Paths are percent-encoded into the JSON, so ANY path character —
  // quotes, backslashes, commas in Hive partition values ("p=a,b"),
  // brackets — survives the regex-based replay instead of corrupting the
  // array split (percent-encoding leaves only [A-Za-z0-9.*_%+-], and '/'
  // round-trips through %2F).
  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, "UTF-8")
  private def dec(s: String): String =
    java.net.URLDecoder.decode(s, "UTF-8")

  // A file's stats serialize as ONE percent-encoded token per file:
  // stat fields joined by \\u0001, stat lines by \\u0002 - both always
  // percent-encoded, so the outer regex/comma split never sees them.
  private val FieldSep = "\u0001"
  private val LineSep = "\u0002"

  private def encStatsArr(ss: Seq[Seq[ColStat]]): String =
    ss.map(fileStats => "\"" + enc(fileStats.map(st =>
      Seq(st.col, st.typ, st.lo, st.hi).mkString(FieldSep)).mkString(LineSep)) + "\"")
      .mkString("[", ",", "]")

  private def decStatsArr(raw: String): Seq[Seq[ColStat]] =
    if (raw.isEmpty) Nil
    else raw.split(",").toSeq.map { x =>
      val blob = dec(x.stripPrefix("\"").stripSuffix("\""))
      if (blob.isEmpty) Seq.empty[ColStat]
      else blob.split(LineSep).toSeq.map { line =>
        val f = line.split(FieldSep)
        require(f.length == 4, s"corrupt stat line: $line")
        ColStat(f(0), f(1), f(2), f(3))
      }
    }

  private[sink] def render(c: Commit): String = {
    def arr(xs: Seq[String]) =
      xs.map(x => "\"" + enc(x) + "\"").mkString("[", ",", "]")
    val statsPart =
      if (c.stats.isEmpty) "" else s""","stats":${encStatsArr(c.stats)}"""
    val txnPart = c.txn.map { case (a, v) =>
      s""","txn":["${enc(a)}",$v]""" }.getOrElse("")
    s"""{"version":${c.version},"added":${arr(c.added)},"removed":${arr(c.removed)}$statsPart$txnPart}"""
  }

  private[sink] def renderCkpt(c: Checkpoint): String = {
    val arr = c.live.map(x => "\"" + enc(x) + "\"").mkString("[", ",", "]")
    val statsPart =
      if (c.stats.forall(_.isEmpty)) ""
      else s""","livestats":${encStatsArr(c.stats)}"""
    // one percent-encoded token per (app, version) pair, like stats —
    // the outer comma split never sees the payload
    val txnsPart =
      if (c.txns.isEmpty) ""
      else s""","txns":${c.txns.map { case (a, v) =>
        "\"" + enc(a + FieldSep + v) + "\"" }.mkString("[", ",", "]")}"""
    s"""{"version":${c.version},"live":$arr$statsPart$txnsPart}"""
  }

  private val LiveRe = """"live":\[(.*?)\]""".r
  private val LiveStatsRe = """"livestats":\[(.*?)\]""".r
  private[sink] def parseCkpt(txt: String): Checkpoint = {
    val ver = VerRe.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad checkpoint: $txt"))
    val live = LiveRe.findFirstMatchIn(txt).map(_.group(1))
      .getOrElse(throw new IllegalArgumentException(
        s"corrupt checkpoint (missing/unterminated live array): $txt"))
    val txns = TxnsRe.findFirstMatchIn(txt).map(_.group(1)).filter(_.nonEmpty)
      .map(_.split(",").toSeq.map { x =>
        val blob = dec(x.stripPrefix("\"").stripSuffix("\""))
        val cut = blob.lastIndexOf(FieldSep)
        require(cut >= 0, s"corrupt txn token: $blob")
        (blob.substring(0, cut), blob.substring(cut + 1).toLong)
      }).getOrElse(Nil)
    Checkpoint(ver,
      if (live.isEmpty) Nil
      else live.split(",").toSeq.map(x => dec(x.stripPrefix("\"").stripSuffix("\""))),
      LiveStatsRe.findFirstMatchIn(txt).map(m => decStatsArr(m.group(1))).getOrElse(Nil),
      txns)
  }
  private val TxnsRe = """"txns":\[(.*?)\]""".r

  private val ArrRe = """"(added|removed)":\[(.*?)\]""".r
  private val VerRe = """"version":(\d+)""".r
  private[sink] def parse(txt: String): Commit = {
    val ver = VerRe.findFirstMatchIn(txt).map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"bad commit: $txt"))
    val arrs = ArrRe.findAllMatchIn(txt).map(m => m.group(1) ->
      (if (m.group(2).isEmpty) Nil
       else m.group(2).split(",").toSeq.map(x => dec(x.stripPrefix("\"").stripSuffix("\""))))).toMap
    // a commit with a truncated/absent array is CORRUPT, not empty —
    // fabricating Commit(v, Nil, Nil) would silently drop files on replay
    require(arrs.contains("added") && arrs.contains("removed"),
      s"corrupt commit (missing/unterminated added/removed arrays): $txt")
    val stats = StatsRe.findFirstMatchIn(txt).map(m => decStatsArr(m.group(1))).getOrElse(Nil)
    val txn = TxnRe.findFirstMatchIn(txt).map(m => (dec(m.group(1)), m.group(2).toLong))
    Commit(ver, arrs("added"), arrs("removed"), stats, txn)
  }
  private val StatsRe = """"stats":\[(.*?)\]""".r
  private val TxnRe = """"txn":\["(.*?)",(\d+)\]""".r
}
