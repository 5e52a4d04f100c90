package graft.config

import org.apache.spark.sql.types._

/** MySQL → Spark type mapping (SURVEY.md §1.2; reference
  * config/datatype_mapping.config:1-20). The reference degrades decimals
  * to float64 — we keep DecimalType for exactness (documented
  * divergence, SURVEY.md §7.4).
  */
object TypeMapping {

  def sparkType(mysqlType: String, precision: Int = 38, scale: Int = 18): DataType =
    mysqlType.toLowerCase match {
      case "bigint"                              => LongType
      case "int" | "integer" | "mediumint"       => IntegerType
      case "smallint"                            => ShortType
      case "tinyint"                             => ByteType
      case "char" | "enum" | "varchar" | "text" |
           "longtext" | "mediumtext" | "json"    => StringType
      case "decimal" | "numeric"                 => DecimalType(precision, scale)
      case "double"                              => DoubleType
      case "float"                               => FloatType
      case "date"                                => DateType
      case "datetime" | "timestamp"              => TimestampType
      case "time"                                => DayTimeIntervalType()
      case "blob" | "binary" | "varbinary"       => BinaryType
      case other =>
        throw new IllegalArgumentException(s"unmapped MySQL type: $other")
    }

  /** Columns with these types get the clamp projection in the reference
    * (ingest_mysql_data.py:183-189); configurable here (Spark's range is
    * wider, but zero-dates from MySQL still warrant normalization).
    */
  val TemporalTypes: Set[String] = Set("date", "datetime", "timestamp")

  /** information_schema projection for schema introspection (S3;
    * reference ingest_mysql_data.py:153-158) — pushed down as a JDBC
    * subquery.
    */
  def informationSchemaSql(db: String, table: String): String =
    s"""(SELECT COLUMN_NAME, DATA_TYPE, CHARACTER_MAXIMUM_LENGTH,
       |        NUMERIC_PRECISION, NUMERIC_SCALE, COLUMN_TYPE
       | FROM information_schema.columns
       | WHERE table_schema = '$db' AND table_name = '$table'
       | ORDER BY ORDINAL_POSITION) AS graft_cols""".stripMargin
}
