package graft.config

import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.SparkSpec
import graft.model.PartitionSpec

class XlsxSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-xlsx").resolve(name).toString

  test("write/read round-trip: escaping, empty cells, ragged rows") {
    val p = tmp("rt.xlsx")
    val rows = Seq(
      Seq("a", "b&c", "d<e>\"f\""),
      Seq("1", "", "json: [{\"k\": 2}]"),
      Seq("only-one"))
    Xlsx.write(p, rows)
    val back = Xlsx.read(p)
    assert(back(0) == rows(0))
    assert(back(1) == rows(1))
    assert(back(2) == Seq("only-one"))
  }

  test("reads the sharedStrings form other writers (pandas/openpyxl) emit") {
    // hand-build the shared-strings variant the codec itself never writes
    val p = tmp("shared.xlsx")
    val zip = new ZipOutputStream(new java.io.FileOutputStream(p))
    def put(name: String, body: String): Unit = {
      zip.putNextEntry(new ZipEntry(name)); zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    put("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><si><t>hello</t></si><si><t>world</t></si></sst>""")
    put("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1"><v>42</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()
    assert(Xlsx.read(p) == Seq(Seq("hello", "world", "42")))
  }

  test("SpecStore.loadXlsx: the reference's native config format loads to typed specs") {
    val p = tmp("config.xlsx")
    val header = SpecStore.schema.fields.map(_.name).toSeq
    def row(id: String, table: String, active: String, group: String, parts: String) =
      Seq(id, "table", "srv", "db", table, "mtime", "", "0", active, "fs", "",
        "id", "lv", s"${table}_lv", "0", parts, group)
    Xlsx.write(p, Seq(header,
      row("1", "t_a", "1", "g1", """[{"seq_no": 1, "column_type": "time-based", "column": "mtime", "format": "YYYYMM"}]"""),
      row("2", "t_b", "1", "g2", ""),
      row("3", "t_off", "0", "g1", "")))
    val specs = SpecStore.loadXlsx(spark, p).collect().sortBy(_.lakeIngestionId)
    assert(specs.map(_.tablename).toSeq == Seq("t_a", "t_b"), "inactive spec filtered")
    assert(specs.head.partitions ==
      Seq(PartitionSpec(1, PartitionSpec.TimeBased, "mtime", "YYYYMM")))
    assert(specs(1).partitions.isEmpty)
    // group filter matches the CSV path's semantics
    assert(SpecStore.loadXlsx(spark, p, Seq("g2")).collect().map(_.tablename).toSeq == Seq("t_b"))
  }

  test("config write→read xlsx cycle: ConfigGen output loads back as the same specs") {
    import spark.implicits._
    val p = tmp("gen.xlsx")
    val df = Seq(
      (1L, "table", "srv", "db", "t_x", "mtime", "", 0, 1, "fs", "", "id",
        "lv", "t_x_lv", 0, """[{"seq_no": 1, "column_type": "non-time-based", "column": "id", "format": "1K"}]""", "g1"))
      .toDF(SpecStore.schema.fields.map(_.name): _*)
    graft.driver.ConfigGen.writeConfigXlsx(df, p)
    val back = SpecStore.loadXlsx(spark, p).collect()
    assert(back.length == 1 && back.head.tablename == "t_x")
    assert(back.head.partitions == Seq(PartitionSpec(1, PartitionSpec.NonTimeBased, "id", "1K")))
  }

  test("loadXlsx fails loudly on a miscased or missing header column") {
    val p = tmp("badheader.xlsx")
    val header = SpecStore.schema.fields.map(_.name).toSeq
      .map(h => if (h == "active_indicator") "Active_Indicator" else h)
    Xlsx.write(p, Seq(header))
    val e = intercept[IllegalArgumentException] { SpecStore.loadXlsx(spark, p) }
    assert(e.getMessage.contains("active_indicator"))
  }
}
