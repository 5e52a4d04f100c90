package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** JSONL (newline-delimited JSON) document ingestion with corrupt-record
  * QUARANTINE — the messy-real-world side of corpus intake that the
  * parquet-native gate tables never exercise: crawler output and vendor
  * drops arrive as JSONL with a tail of truncated/malformed lines, and
  * the pipeline contract is "parse what parses, keep the rest VISIBLE"
  * (a dropped line is a silent data loss; a quarantined line is an
  * auditable row).
  *
  * Shape: a line-splittable `text` scan + codegen'd `from_json` against
  * an EXPLICIT schema (schema inference at corpus scale is a full extra
  * pass — never pay it in production). This deliberately avoids the
  * `spark.read.json` `_corrupt_record` column: Spark disallows scans
  * whose pruned column set is ONLY the corrupt column
  * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), which is
  * exactly what a quarantine count does — the documented workaround is
  * caching the parse, a non-starter at 100 TB. Here the raw line is an
  * ordinary column, so good/quarantine are plain filters: one file
  * scan, zero shuffles, no cache.
  *
  * Reference analog: extractors/ingest_files.py routes unparseable
  * drop files to an error log rather than failing the run — same
  * keep-it-visible contract, file-level there, line-level here.
  */
object Jsonl {

  val CorruptCol = "_corrupt_record"
  private val RawCol = "__raw_line"

  /** Quarantine test: the parser either nulled the whole struct or set
    * its corrupt field (PERMISSIVE type-mismatch contract).
    */
  private def isCorrupt(parsed: Column): Column =
    parsed.isNull || parsed.getField(CorruptCol).isNotNull

  /** Read `path` as JSONL against `schema`, unparseable or wrong-typed
    * lines kept RAW in [[CorruptCol]] instead of dropped. Blank lines
    * are skipped (matching `spark.read.json`). Columns: the schema's
    * fields (null where quarantined) plus [[CorruptCol]].
    */
  def readWithQuarantine(spark: SparkSession, path: String,
                         schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    val parsedSchema = schema.add(CorruptCol, StringType)
    val fields = schema.fieldNames.map(f => col(s"__p.$f").as(f))
    spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(from_json(col("value"), parsedSchema,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol)).as("__p"),
        col("value").as(RawCol))
      .select(fields :+
        when(isCorrupt(col("__p")), col(RawCol)).as(CorruptCol): _*)
  }

  /** Cleanly parsed rows, corrupt column dropped. */
  def good(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)

  /** Quarantined raw lines (auditable, re-parseable after a fix). */
  def quarantine(df: DataFrame): DataFrame =
    df.filter(col(CorruptCol).isNotNull).select(col(CorruptCol).as("raw_line"))
}
