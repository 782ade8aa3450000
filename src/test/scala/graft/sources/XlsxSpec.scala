package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real SpreadsheetML parsing ([[XlsxReader]]): A1-ref column placement
  * with gaps, shared-string resolution, cell-type decode, multi-sheet
  * emission, and the per-file corruption isolation contract.
  */
class XlsxSpec extends SparkSpec {

  test("colIndex: A1 letters to 0-based column index") {
    assert(XlsxReader.colIndex("A1") == 0)
    assert(XlsxReader.colIndex("Z9") == 25)
    assert(XlsxReader.colIndex("AA12") == 26)
    assert(XlsxReader.colIndex("AZ3") == 51)
    assert(XlsxReader.colIndex("BA3") == 52)
  }

  test("round-trip: strings via shared table, numbers raw, booleans, gaps null") {
    val rows: Seq[Seq[Any]] = Seq(
      Seq("name", "n", "flag"),
      Seq("alpha", 1, true),
      Seq(null, 2, false), // leading gap: cells B,C carry refs B3,C3
      Seq("gamma & <co>", 3, null)) // XML-escaping + trailing gap
    val sheets = XlsxReader.sheets(XlsxReader.xlsxBytes(rows))
    assert(sheets.length == 1 && sheets.head.index == 1)
    val got = sheets.head.rows
    assert(got(0) == Seq("name", "n", "flag"))
    assert(got(1) == Seq("alpha", "1", "true"))
    assert(got(2) == Seq(null, "2", "false"))
    assert(got(3) == Seq("gamma & <co>", "3"))
    // the interned string table actually deduplicates
    val again = XlsxReader.xlsxBytes(Seq(Seq("x", "x", "x")))
    val zin = new java.util.zip.ZipInputStream(new java.io.ByteArrayInputStream(again))
    val sst = Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
      .find(_.getName == "xl/sharedStrings.xml")
      .map(_ => new String(zin.readAllBytes(), "UTF-8")).get
    zin.close()
    assert("<si>".r.findAllIn(sst).length == 1)
  }

  test("shared strings resolve even when sst follows the worksheet in the zip") {
    // xlsxBytes writes the worksheet entry BEFORE sharedStrings.xml — the
    // reader must collect-then-parse, not stream in zip order
    val b = XlsxReader.xlsxBytes(Seq(Seq("later-interned")))
    assert(XlsxReader.sheets(b).head.rows == Seq(Seq("later-interned")))
  }

  test("distributed read: typed rows, header skip, corrupt file isolated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_xlsx").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "ok.xlsx"),
      XlsxReader.xlsxBytes(Seq(Seq("k", "v"), Seq(1, "a"), Seq(2, "b"))))
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "bad.xlsx"),
      Array[Byte](1, 2, 3, 4))
    val df = XlsxReader.readXlsx(spark, dir).cache()
    val ok = df.filter(col("row_idx") >= 1)
      .select(element_at(col("cells"), 1).cast("int").as("k"),
        element_at(col("cells"), 2).as("v"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sortBy(_._1).toSeq
    assert(ok == Seq(1 -> "a", 2 -> "b"))
    val corrupt = df.filter(col("row_idx") === -1).collect()
    assert(corrupt.length == 1)
    assert(corrupt.head.getAs[String]("path").endsWith("bad.xlsx"))
    assert(corrupt.head.getSeq[String](3).head.startsWith("_corrupt:"))
  }

  test("inline strings and refless cells append in order") {
    // hand-built worksheet exercising t="inlineStr" and cells without r=
    val sheet =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c t="inlineStr"><is><t>in line</t></is></c><c><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin
    val minimal = minimalWorkbook("xl/worksheets/sheet1.xml" -> sheet)
    assert(XlsxReader.sheets(minimal).head.rows == Seq(Seq("in line", "7")))
  }

  test("multiple worksheets emit with their sheet index, in order") {
    def ws(v: String) =
      s"""<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<sheetData><row r="1"><c r="A1"><v>$v</v></c></row></sheetData></worksheet>""".stripMargin
    val b = minimalWorkbook(
      "xl/worksheets/sheet2.xml" -> ws("22"),
      "xl/worksheets/sheet1.xml" -> ws("11"))
    val got = XlsxReader.sheets(b)
    assert(got.map(_.index) == Seq(1, 2))
    assert(got.map(_.rows.head.head) == Seq("11", "22"))
  }

  private def minimalWorkbook(entries: (String, String)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(out)
    try entries.foreach { case (n, c) =>
      z.putNextEntry(new java.util.zip.ZipEntry(n))
      z.write(c.getBytes("UTF-8")); z.closeEntry()
    } finally z.close()
    out.toByteArray
  }
}
