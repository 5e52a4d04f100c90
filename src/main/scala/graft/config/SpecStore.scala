package graft.config

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{IngestionSpec, PartitionSpec}

/** Control-config source: CSV/JSON/XLSX file → `Dataset[IngestionSpec]`
  * (SURVEY.md §2.1 S4). The reference reads an Excel sheet from S3 into
  * pandas and `eval()`s the partition tuple cell
  * (start_ingestion.py:222-270); here the partition cell is a JSON array
  * parsed through `from_json` — typed, no code execution — and the file
  * may be CSV or the reference's native xlsx (via the dependency-free
  * [[Xlsx]] codec), so existing control sheets load unchanged.
  */
object SpecStore {

  /** partition_config cell: JSON array of {seq_no, column_type, column, format}. */
  private val partitionSchema = ArrayType(StructType(Seq(
    StructField("seq_no", IntegerType),
    StructField("column_type", StringType),
    StructField("column", StringType),
    StructField("format", StringType))))

  val schema: StructType = StructType(Seq(
    StructField("lake_ingestion_id", LongType),
    StructField("ingestion_type", StringType),
    StructField("servername", StringType),
    StructField("databasename", StringType),
    StructField("tablename", StringType),
    StructField("delta_field", StringType),
    StructField("delta_field_expr", StringType),
    StructField("date_not_available", IntegerType),
    StructField("active_indicator", IntegerType),
    StructField("target_type", StringType),
    StructField("target_location", StringType),
    StructField("primary_key", StringType),
    StructField("view_db", StringType),
    StructField("view_name", StringType),
    StructField("view_needed", IntegerType),
    StructField("partition_config", StringType),
    StructField("airflow_dag_group", StringType)))

  /** Load + filter the active specs for the requested dag groups (F4 +
    * F7: `active_indicator == 1 and group in (…)` with null-normalized
    * string columns, reference start_ingestion.py:220-234, 255).
    */
  def load(spark: SparkSession, path: String, dagGroups: Seq[String] = Nil): Dataset[IngestionSpec] = {
    // escape=" : RFC4180 doubled-quote escaping (the JSON partition cell
    // carries quotes); Spark's default escape is backslash
    val raw = spark.read.schema(schema)
      .option("header", "true").option("escape", "\"").csv(path)
    fromDataFrame(raw, dagGroups)
  }

  /** Load the reference's NATIVE config format: an xlsx control sheet
    * (first row = headers matching [[schema]] column names; cells typed
    * by schema cast, blank → NULL like the CSV path).
    */
  def loadXlsx(spark: SparkSession, path: String,
               dagGroups: Seq[String] = Nil): Dataset[IngestionSpec] = {
    val rows = Xlsx.read(path)
    require(rows.nonEmpty, s"$path: empty sheet")
    val header = rows.head.map(_.trim)
    val missing = schema.fields.map(_.name).filterNot(header.contains)
    // fail fast: a miscased/renamed header would otherwise load all-null
    // columns — silently zero specs, or worse, specs sharing id 0
    require(missing.isEmpty,
      s"$path: header is missing config columns ${missing.mkString(", ")} (got: ${header.mkString(", ")})")
    val idx = schema.fields.map(f => header.indexOf(f.name))
    val strRows = rows.tail.map(r =>
      org.apache.spark.sql.Row(idx.map(i =>
        if (i < 0 || i >= r.size || r(i).isEmpty) null else r(i)): _*))
    val strSchema = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(strRows.toList, 1), strSchema)
    val typed = df.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    fromDataFrame(typed, dagGroups)
  }

  def fromDataFrame(raw: DataFrame, dagGroups: Seq[String] = Nil): Dataset[IngestionSpec] = {
    import raw.sparkSession.implicits._
    val active = raw
      .na.fill("", raw.schema.filter(_.dataType == StringType).map(_.name))
      .filter(col("active_indicator") === 1)
    val filtered =
      if (dagGroups.isEmpty) active
      else active.filter(col("airflow_dag_group").isin(dagGroups: _*))
    filtered
      .withColumn("__parts", coalesce(
        from_json(col("partition_config"), partitionSchema),
        array()))
      .map { row =>
        IngestionSpec(
          lakeIngestionId = row.getAs[Long]("lake_ingestion_id"),
          ingestionType = row.getAs[String]("ingestion_type"),
          servername = row.getAs[String]("servername"),
          databasename = row.getAs[String]("databasename"),
          tablename = row.getAs[String]("tablename"),
          deltaField = row.getAs[String]("delta_field"),
          deltaFieldExpr = row.getAs[String]("delta_field_expr"),
          dateNotAvailable = row.getAs[Int]("date_not_available"),
          activeIndicator = row.getAs[Int]("active_indicator"),
          targetType = row.getAs[String]("target_type"),
          targetLocation = row.getAs[String]("target_location"),
          primaryKey = row.getAs[String]("primary_key"),
          viewDb = row.getAs[String]("view_db"),
          viewName = row.getAs[String]("view_name"),
          viewNeeded = row.getAs[Int]("view_needed"),
          partitions = row.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("__parts")
            .toSeq.map(p =>
              PartitionSpec(p.getAs[Int]("seq_no"), p.getAs[String]("column_type"),
                p.getAs[String]("column"), p.getAs[String]("format"))),
          dagGroup = row.getAs[String]("airflow_dag_group"))
      }
  }
}
