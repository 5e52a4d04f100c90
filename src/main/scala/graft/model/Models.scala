package graft.model

/** Core metadata relations of the engine (SURVEY.md §1.1).
  *
  * These are the typed replacements for the reference's untyped pandas
  * frames: the control config (reference: update_config.py:34-41), the
  * partition spec tuple (reference: update_config.py:215-218, parsed with
  * `eval` at start_ingestion.py:270 — here a typed case class instead), and
  * the append-only execution log (reference: config/basic_config.py:54-57).
  */

/** One derived-partition rule (reference: update_config.py:215-218).
  *
  * `columnType` ∈ {time-based, non-time-based}; `format` ∈
  * {YYYYMMDD, YYYYMM, YYYY} for time-based, {1M, 1K, ...} bucket width for
  * non-time-based (reference: ingest_mysql_data.py:452-477).
  */
final case class PartitionSpec(
    seqNo: Int,
    columnType: String,
    column: String,
    format: String,
)

object PartitionSpec {
  val TimeBased = "time-based"
  val NonTimeBased = "non-time-based"
}

/** One row of the control config — one incremental ingestion
  * (reference: update_config.py:34-41; FIXTURES.md §1).
  */
final case class IngestionSpec(
    lakeIngestionId: Long,
    ingestionType: String,
    servername: String,
    databasename: String,
    tablename: String,
    deltaField: String,
    deltaFieldExpr: String, // "" or e.g. coalesce(modified_datetime, created_datetime)
    dateNotAvailable: Int, // 0 = datetime watermark, 1 = integer watermark
    activeIndicator: Int,
    targetType: String,
    targetLocation: String,
    primaryKey: String, // comma-joined key columns
    viewDb: String,
    viewName: String,
    viewNeeded: Int,
    partitions: Seq[PartitionSpec],
    dagGroup: String,
) {
  def primaryKeyCols: Seq[String] =
    primaryKey.split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq
  def hasDeltaExpr: Boolean = deltaFieldExpr.trim.nonEmpty
  /** The expression actually tracked for the watermark. */
  def deltaExpr: String = if (hasDeltaExpr) deltaFieldExpr else deltaField
}

/** Execution-log statuses (reference: ingest_mysql_data.py:393-398, 599;
  * start_ingestion.py:134-142).
  */
object RunStatus {
  val Started = "started"
  val DataLoaded = "data-loaded-to-s3"
  val NoData = "no-data-to-load"
  val Failed = "failed"
  val Success = "success"
  val ValidationFailure = "validation-failure"
  val ExtractionFailure = "extraction-failure"
}

object ReasonCode {
  val FirstTime = "First-time-ingestion"
  val Subsequent = "Subsequent-ingestion"
  val ValidationSuccess = "validation-success"
  val ValidationSkipped = "validation-skipped"
  val ValidationFailure = "validation-failure"
}

/** One append-only execution-log row (reference: config/basic_config.py:54-57,
  * common_utils.py:62-90). `startValue`/`endValue` are strings because the
  * watermark is either a timestamp literal or an integer literal depending on
  * `dateNotAvailable` (reference: ingest_mysql_data.py:113-147).
  */
final case class RunLog(
    lakeIngestionId: Long,
    executionStatus: String,
    startValue: String,
    endValue: String,
    sourceCount: Long,
    targetCount: Long,
    reasonCode: String,
    insertDatetime: java.sql.Timestamp,
)
