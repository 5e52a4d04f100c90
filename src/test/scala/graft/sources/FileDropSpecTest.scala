package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec

class FileDropSpecTest extends SparkSpec {

  private def mkDrop(): String =
    Files.createTempDirectory("graft-drop").toString

  private def drop(dir: String, name: String, lines: String*): Unit =
    Files.write(Paths.get(dir, name), (Seq("id,v") ++ lines).mkString("\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  private val spec = FileDropSpec("reports", pattern = "report_.*\\.csv",
    schemaDdl = Some("id BIGINT, v STRING"))

  test("claims by pattern once, skips claimed files on the next pull, loads re-drops") {
    val dir = mkDrop()
    val src = new FileDropSource(spark, s"$dir/in", s"$dir/manifest")
    Files.createDirectories(Paths.get(s"$dir/in"))
    drop(s"$dir/in", "report_a.csv", "1,x", "2,y")
    drop(s"$dir/in", "report_b.csv", "3,z")
    drop(s"$dir/in", "notes.txt", "9,ignored")

    val run1 = src.runOnce(spec, s"$dir/lake")
    assert(run1.map(_.name) == Seq("report_a.csv", "report_b.csv"), "pattern claim")
    assert(spark.read.parquet(s"$dir/lake").count() == 3)

    // second pull: nothing new → no-op, no lake write
    assert(src.runOnce(spec, s"$dir/lake").isEmpty)
    assert(spark.read.parquet(s"$dir/lake").count() == 3)

    // a NEW file and a re-dropped file with CHANGED content both load
    drop(s"$dir/in", "report_c.csv", "4,w")
    drop(s"$dir/in", "report_a.csv", "1,x", "2,y", "5,new")
    val run3 = src.runOnce(spec, s"$dir/lake")
    assert(run3.map(_.name) == Seq("report_a.csv", "report_c.csv"))
    // at-least-once: report_a's rows appear twice; lineage column tells which file
    val lake = spark.read.parquet(s"$dir/lake")
    assert(lake.count() == 3 + 1 + 3)
    assert(lake.columns.contains("source_file"))
  }

  test("two sources share a manifest without claiming each other's files") {
    val dir = mkDrop()
    val src = new FileDropSource(spark, s"$dir/in", s"$dir/manifest")
    Files.createDirectories(Paths.get(s"$dir/in"))
    drop(s"$dir/in", "report_a.csv", "1,x")
    drop(s"$dir/in", "audit_a.csv", "2,y")
    val audit = FileDropSpec("audits", pattern = "audit_.*\\.csv",
      schemaDdl = Some("id BIGINT, v STRING"))

    assert(src.runOnce(spec, s"$dir/lakeR").map(_.name) == Seq("report_a.csv"))
    assert(src.runOnce(audit, s"$dir/lakeA").map(_.name) == Seq("audit_a.csv"))
    // each source's claim is independent: re-pull is a no-op for both
    assert(src.runOnce(spec, s"$dir/lakeR").isEmpty)
    assert(src.runOnce(audit, s"$dir/lakeA").isEmpty)
  }

  test("pending scales: thousands of files diff via an anti-join, not a driver set") {
    val dir = mkDrop()
    val src = new FileDropSource(spark, s"$dir/in", s"$dir/manifest")
    Files.createDirectories(Paths.get(s"$dir/in"))
    val n = 3000
    (1 to n).foreach(i => drop(s"$dir/in", f"report_$i%05d.csv", s"$i,x"))
    val listed = src.listMatching(spec)
    assert(listed.size == n)
    // claim the first half directly in the manifest (no 3000-file read)
    src.commit(spec, listed.take(n / 2))
    // the manifest diff must be a left-anti JOIN: the processed-file
    // manifest stays distributed, only the pending claim list collects
    val plan = src.pendingDf(spec, listed).queryExecution.executedPlan.toString
    assert(plan.contains("LeftAnti"), s"expected anti-join plan:\n$plan")
    val pend = src.pending(spec)
    assert(pend.size == n / 2)
    assert(pend.map(_.name) == listed.drop(n / 2).map(_.name))
  }

  test("empty or missing drop directory is a clean no-op") {
    val dir = mkDrop()
    val src = new FileDropSource(spark, s"$dir/nonexistent", s"$dir/manifest")
    assert(src.runOnce(spec, s"$dir/lake").isEmpty)
  }

  test("reportUrl extracts the marker-anchored href from an HTML mail body") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // the reference's shape (extractors/ingest_files.py:136-137): CRLF
    // inside the markup, marker comment, unquoted href terminated by space
    val body =
      "<html><body><!-- CTA OUTLOOK START-->\r\n<span>View report</span>" +
      "<!-- CTA OUTLOOK END--><a href=https://reports.example.com/dl/abc123.csv " +
      "target=\"_blank\">VIEW REPORT</a>\r\n" +
      "<a href=\"https://example.com/unsubscribe\">Unsubscribe</a></body></html>"
    val df = Seq(
      (1L, body),
      (2L, "<html><body>no marker here <a href=\"https://x.example/y\">link</a></body></html>"),
      (3L, "<!-- CTA OUTLOOK END--><a href='https://q.example/r.csv'>go</a>"))
      .toDF("id", "body")
    val got = df.select(col("id"), FileDropSource.reportUrl(col("body")).as("url"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got(1L).contains("https://reports.example.com/dl/abc123.csv"), "unquoted href")
    assert(got(2L).isEmpty, "no marker -> null")
    assert(got(3L).contains("https://q.example/r.csv"), "single-quoted href")

    val all = df.filter(col("id") === 1L)
      .select(FileDropSource.allUrls(col("body")).as("urls"))
      .collect().head.getSeq[String](0)
    assert(all == Seq("https://reports.example.com/dl/abc123.csv",
      "https://example.com/unsubscribe"), "all hrefs in document order")
  }
}
