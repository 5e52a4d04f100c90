package graft.state

import java.sql.Timestamp
import java.time.LocalDateTime
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{ReasonCode, RunLog, RunStatus}

/** Append-only execution-log state store + watermark recovery.
  *
  * The reference persists one CSV per run under a date-bucketed S3 prefix
  * and rediscovers the latest via a day→month→prev-month→all fallback walk
  * (reference: common_utils.py:292-401). Here the log is ONE append-only
  * parquet table per lake — the "latest state" is a filter + max aggregate,
  * and the fallback walk disappears (SURVEY.md §2.10).
  */
final class LogStore(spark: SparkSession, path: String) {
  import spark.implicits._

  /** Append one batch of log rows, safe under CONCURRENT WRITERS — in
    * this JVM or across processes (round 9; r8 left cross-process as a
    * doc-only single-writer contract). A direct
    * `write.mode(Append).parquet(path)` stages through the
    * FileOutputCommitter's `_temporary/0` under the LOG dir — shared by
    * every concurrent job targeting it, same-process or not, so one
    * writer's commit/cleanup deletes another's staged files. Here each
    * append gets its OWN hidden staging dir (`.stage-<uuid>` — dot
    * prefix, invisible to readers) and publishes by renaming the one
    * part file to a UNIQUE final name: no two appends ever share a
    * staging area or contend on a destination, so even a
    * clobber-on-rename object store has no same-name victim
    * (LogStoreHostileSpec races unlocked writers to prove it). A killed
    * writer leaves only hidden staging garbage; a TORN rename on a
    * copy+delete store still fails the next read loudly (pinned by the
    * hostile spec — recovery never proceeds on partial state). The
    * JVM-wide per-path lock stays as a cheap same-process serializer.
    */
  def append(rows: Seq[RunLog]): Unit = LogStore.lockFor(path).synchronized {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(p)
    val id = java.util.UUID.randomUUID().toString
    val stage = new org.apache.hadoop.fs.Path(p, s".stage-$id")
    try {
      spark.createDataset(rows).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(stage.toString)
      val part = fs.listStatus(stage).map(_.getPath)
        .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"log append: no part file staged under $stage"))
      val dst = new org.apache.hadoop.fs.Path(p, s"part-$id.snappy.parquet")
      require(fs.rename(part, dst), s"log append: rename $part -> $dst failed")
    } finally fs.delete(stage, true)
  }

  /** Missing log dir = no runs yet. Probed via Hadoop FS (`fs.exists`
    * never throws on absence) rather than by catching Spark's missing-path
    * error, whose TYPE is session-state-dependent: a fresh session
    * surfaces the raw `FileNotFoundException`, a warmed one wraps it in
    * `AnalysisException` — catching only the latter crashed the first
    * lifecycle run when it happened to be the session's first read. The
    * `AnalysisException` catch stays for the exists-but-empty dir a
    * killed first append can leave behind (no footer → no schema).
    */
  def read(): Dataset[RunLog] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) spark.emptyDataset[RunLog]
    else try spark.read.parquet(path).as[RunLog]
    catch { case _: org.apache.spark.sql.AnalysisException => spark.emptyDataset[RunLog] }
  }

  def forIngestion(id: Long): Dataset[RunLog] =
    read().filter(_.lakeIngestionId == id)
}

object LogStore {
  /** Per-path append locks (JVM-wide, covers multiple LogStore
    * instances over one log directory).
    */
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    locks.computeIfAbsent(path, _ => new Object)

  /** Accepts optional fractional seconds — delta columns are often µs
    * precision and `end_value` records them exactly (a plain
    * seconds-only parse crashed watermark recovery on such logs).
    */
  val TsFmt: DateTimeFormatter = new java.time.format.DateTimeFormatterBuilder()
    .appendPattern("yyyy-MM-dd HH:mm:ss")
    .optionalStart()
    .appendFraction(java.time.temporal.ChronoField.NANO_OF_SECOND, 1, 9, true)
    .optionalEnd()
    .toFormatter()

  private val PlainFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
  private val FracFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
  private def fmtTs(t: LocalDateTime): String =
    if (t.getNano == 0) t.format(PlainFmt) else t.format(FracFmt)

  /** First-run defaults (reference: ingest_mysql_data.py:113-124). */
  val FirstRunDatetime = "2020-01-01 00:00:00"
  val FirstRunInt = "1"

  /** Watermark recovery + bump (reference: ingest_mysql_data.py:110-149).
    *
    * start value = max(end_value) over prior `success` rows, bumped by
    * +1 second (datetime mode) or +1 (integer mode). The +1s bump can skip
    * rows that land in the boundary second after the run — kept for parity
    * but `inclusiveBump=false` switches to the principled `> last` form
    * (SURVEY.md §7.4).
    */
  def nextStartValue(priorSuccess: Seq[RunLog], dateNotAvailable: Boolean,
                     inclusiveBump: Boolean = true): (String, String) = {
    val ends = priorSuccess.filter(_.executionStatus == RunStatus.Success).map(_.endValue)
      .filter(v => v != null && v.nonEmpty)
    if (ends.isEmpty) {
      val start = if (dateNotAvailable) FirstRunInt else FirstRunDatetime
      (start, ReasonCode.FirstTime)
    } else if (dateNotAvailable) {
      val last = ends.map(_.toLong).max
      val start = if (inclusiveBump) (last + 1).toString else last.toString
      (start, ReasonCode.Subsequent)
    } else {
      val last = ends.map(e => LocalDateTime.parse(e, TsFmt)).max(Ordering.fromLessThan[LocalDateTime](_ isBefore _))
      val bumped = if (inclusiveBump) last.plusSeconds(1) else last
      (fmtTs(bumped), ReasonCode.Subsequent)
    }
  }

  def now(): Timestamp = new Timestamp(System.currentTimeMillis())

  /** Latest log row per ingestion id — argmax by insert time with a
    * deterministic status tie-break (reference picks max insert_datetime
    * with ties unhandled, start_ingestion.py:96-97; SURVEY.md §7.4).
    */
  def latestPerIngestion(logs: DataFrame): DataFrame =
    graft.operators.LatestRowView.latestPerKey(
      logs, Seq("lakeIngestionId"), Seq(col("insertDatetime"), col("executionStatus")))
}
