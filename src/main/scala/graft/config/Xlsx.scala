package graft.config

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayInputStream, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import org.w3c.dom.Element

/** Minimal XLSX codec — enough of SpreadsheetML to round-trip the
  * reference's tabular config sheets (aws_utils.py:265-299 reads/writes
  * the control xlsx via pandas+openpyxl; this closes the repo's last
  * documented divergence, which fell back to CSV because no xlsx library
  * resolves offline). An .xlsx file is a zip of XML parts; the JDK ships
  * both the zip codec and a DOM parser, so no dependency is needed.
  *
  * Supported surface, deliberately small: ONE sheet, string-typed cells.
  * Writing emits inline strings (`t="inlineStr"`); reading handles inline
  * strings, shared strings (`t="s"` + sharedStrings.xml — what
  * pandas/openpyxl emit), and raw `<v>` values (numbers/booleans as their
  * literal text). Formulas/styles/dates-as-serials are out of scope: the
  * config sheets are typed downstream by SpecStore's schema cast.
  *
  * Driver-side only by design: config sheets are O(100) rows of control
  * metadata, never data-plane input.
  */
object Xlsx {

  private def esc(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  private def colName(i: Int): String = {
    var n = i; var s = ""
    while (n >= 0) { s = ('A' + n % 26).toChar.toString + s; n = n / 26 - 1 }
    s
  }

  private def colIndex(ref: String): Int =
    ref.takeWhile(_.isLetter).foldLeft(0)((a, c) => a * 26 + (c - 'A' + 1)) - 1

  // ---------------------------------------------------------------- write

  def write(path: String, rows: Seq[Seq[String]]): Unit = {
    val sheetRows = rows.zipWithIndex.map { case (cells, r) =>
      val cs = cells.zipWithIndex.map { case (v, c) =>
        s"""<c r="${colName(c)}${r + 1}" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
      }.mkString
      s"""<row r="${r + 1}">$cs</row>"""
    }.mkString
    val parts = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |</Relationships>""".stripMargin,
      "xl/worksheets/sheet1.xml" ->
        s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
           |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>$sheetRows</sheetData></worksheet>""".stripMargin,
    )
    val zip = new ZipOutputStream(new BufferedOutputStream(new FileOutputStream(path)))
    try parts.foreach { case (name, content) =>
      zip.putNextEntry(new ZipEntry(name))
      zip.write(content.getBytes("UTF-8"))
      zip.closeEntry()
    } finally zip.close()
  }

  // ----------------------------------------------------------------- read

  def read(path: String): Seq[Seq[String]] = {
    // slurp the two parts we need in one zip pass
    var sheet: Array[Byte] = null
    var shared: Array[Byte] = null
    val zin = new ZipInputStream(new BufferedInputStream(new FileInputStream(path)))
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (e.getName == "xl/worksheets/sheet1.xml") sheet = zin.readAllBytes()
        else if (e.getName == "xl/sharedStrings.xml") shared = zin.readAllBytes()
        e = zin.getNextEntry
      }
    } finally zin.close()
    require(sheet != null, s"$path: no xl/worksheets/sheet1.xml — not an xlsx?")

    def dom(bytes: Array[Byte]) = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes))
    }
    def textOf(e: Element, tag: String): Option[String] = {
      val ns = e.getElementsByTagName(tag)
      if (ns.getLength == 0) None else Some(ns.item(0).getTextContent)
    }

    val sharedStrings: IndexedSeq[String] =
      if (shared == null) IndexedSeq.empty
      else {
        val sis = dom(shared).getElementsByTagName("si")
        (0 until sis.getLength).map(i => sis.item(i).getTextContent)
      }

    val rowNodes = dom(sheet).getElementsByTagName("row")
    (0 until rowNodes.getLength).map { r =>
      val cells = rowNodes.item(r).asInstanceOf[Element].getElementsByTagName("c")
      val byCol = scala.collection.mutable.Map[Int, String]()
      (0 until cells.getLength).foreach { i =>
        val c = cells.item(i).asInstanceOf[Element]
        val idx = Option(c.getAttribute("r")).filter(_.nonEmpty).map(colIndex).getOrElse(i)
        val v = c.getAttribute("t") match {
          case "inlineStr" => textOf(c, "t").getOrElse("")
          case "s" => textOf(c, "v").map(_.trim.toInt).map(sharedStrings).getOrElse("")
          case _ => textOf(c, "v").getOrElse("")
        }
        byCol(idx) = v
      }
      val width = if (byCol.isEmpty) 0 else byCol.keys.max + 1
      (0 until width).map(byCol.getOrElse(_, "")).toSeq
    }
  }
}
