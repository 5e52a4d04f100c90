package graft.driver

import graft.SparkSpec

class ConfigGenSpec extends SparkSpec {
  import spark.implicits._

  test("anti-join discovers only unconfigured tables; ids continue from max") {
    val tables = Seq(
      ("db1", "known", true, true, Some("id"), Some("id"), Some("modified_datetime")),
      ("db1", "fresh_both", true, true, Some("id"), Some("id"), Some("modified_datetime")),
      ("db1", "fresh_created", true, false, None, Some("id"), Some("created_datetime")),
      ("db1", "fresh_autoinc", false, false, Some("seq"), Some("seq"), None),
      ("db1", "fresh_nothing", false, false, None, None, None),
    ).toDF("databasename", "tablename", "has_created", "has_modified",
      "auto_inc_col", "pkey", "datetime_col")
    val existing = Seq((7L, "db1", "known")).toDF("lake_ingestion_id", "databasename", "tablename")

    val rows = ConfigGen.newSpecRows(tables, existing, "/lake").collect()
      .map(r => r.getAs[String]("tablename") -> r).toMap
    assert(rows.size == 4 && !rows.contains("known"))
    assert(rows.values.map(_.getAs[Long]("lake_ingestion_id")).toSet == Set(8L, 9L, 10L, 11L))

    val both = rows("fresh_both")
    assert(both.getAs[String]("delta_field") == "modified_datetime")
    assert(both.getAs[String]("delta_field_expr") == "coalesce(modified_datetime, created_datetime)")
    assert(both.getAs[String]("partition_config").contains("time-based"))

    val created = rows("fresh_created")
    assert(created.getAs[String]("delta_field") == "created_datetime")
    assert(created.getAs[String]("delta_field_expr") == "")

    val autoinc = rows("fresh_autoinc")
    assert(autoinc.getAs[String]("delta_field") == "seq")
    assert(autoinc.getAs[Int]("date_not_available") == 1)
    assert(autoinc.getAs[String]("partition_config").contains("non-time-based"))

    assert(rows("fresh_nothing").getAs[Int]("active_indicator") == 0)

    val merged = ConfigGen.mergeConfig(existing, ConfigGen.newSpecRows(tables, existing, "/lake"))
    assert(merged.count() == 5)
    // generated partition JSON parses through SpecStore's typed schema
    val parsed = graft.config.SpecStore.fromDataFrame(
      ConfigGen.newSpecRows(tables, existing, "/lake")
        .withColumnRenamed("view_db", "view_db")).collect()
    assert(parsed.find(_.tablename == "fresh_both").get.partitions.head.format == "YYYYMMDD")
  }
}
