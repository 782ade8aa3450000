package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** REAL .xlsx ingestion — the spreadsheet sibling of [[DocxReader]] (the
  * reference reads only csv/docx/json/parquet; spreadsheets are the other
  * office format every data-lake intake actually receives). An .xlsx is a
  * zip (OOXML SpreadsheetML): `xl/worksheets/sheetN.xml` holds rows of
  * cells, `xl/sharedStrings.xml` the interned string table. This reader
  * walks the zip with `java.util.zip` and streams the XML with StAX —
  * pure JVM, no added dependency.
  *
  * Fidelity notes (the real-world traps, all handled + spec-pinned):
  *  - cells carry their A1-style ref (`r="BC12"`): ABSENT cells leave
  *    GAPS that must surface as nulls at the right column index, not as a
  *    silent left-shift of the row;
  *  - string cells (`t="s"`) hold an INDEX into the shared-string table,
  *    which may sit after the worksheet in the zip stream (single-pass
  *    collect-then-parse);
  *  - inline strings (`t="inlineStr"`, `<is><t>`), booleans (`t="b"`,
  *    0/1) and raw numeric `<v>` text are each decoded by kind;
  *  - multiple worksheets emit with their 1-based sheet index.
  *
  * Spark-side shape: files load through the built-in `binaryFile` source
  * (distributed, one task per file group) and decode inside a `flatMap` —
  * per-record imperative work, the same executor-side placement as the
  * media codecs and [[DocxReader]]. Per-file isolation: a corrupt file
  * yields one `_corrupt` marker row instead of failing the scan (A10).
  *
  * Security: DTDs and external entities are disabled — an untrusted
  * spreadsheet must not be able to XXE the executor.
  */
object XlsxReader {

  /** One parsed sheet: 1-based index and rows of cells (null = absent). */
  final case class Sheet(index: Int, rows: Seq[Seq[String]])

  /** Parse a whole workbook: every worksheet, rows in sheet order, cells
    * placed at their A1-ref column index (gaps null), width = widest ref
    * seen in the row.
    */
  def sheets(bytes: Array[Byte]): Seq[Sheet] = {
    val entries = zipEntries(bytes)
    val shared: IndexedSeq[String] = entries.get("xl/sharedStrings.xml")
      .map(parseSharedStrings).getOrElse(IndexedSeq.empty)
    val sheetEntries = entries.keys
      .flatMap { n =>
        val m = SheetName.findFirstMatchIn(n)
        m.map(mm => mm.group(1).toInt -> n)
      }
      .toSeq.sortBy(_._1)
    require(sheetEntries.nonEmpty, "not an .xlsx: no xl/worksheets/sheet*.xml entry")
    sheetEntries.map { case (idx, name) =>
      Sheet(idx, parseWorksheet(entries(name), shared))
    }
  }

  private val SheetName = "^xl/worksheets/sheet(\\d+)\\.xml$".r

  /** Single pass over the zip stream, collecting the parts we parse —
    * sharedStrings can follow the worksheets, so streaming straight into
    * the XML parser is not an option.
    */
  private def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    try {
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null).foreach { e =>
        if (e.getName == "xl/sharedStrings.xml" ||
            SheetName.findFirstIn(e.getName).isDefined) {
          val buf = new ByteArrayOutputStream()
          val chunk = new Array[Byte](8192)
          Iterator.continually(zin.read(chunk)).takeWhile(_ > 0)
            .foreach(n => buf.write(chunk, 0, n))
          out += e.getName -> buf.toByteArray
        }
      }
    } finally zin.close()
    out.result()
  }

  private def xmlReader(xml: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(xml), "UTF-8")
  }

  private def parseSharedStrings(xml: Array[Byte]): IndexedSeq[String] = {
    val r = xmlReader(xml)
    val out = IndexedSeq.newBuilder[String]
    val cur = new StringBuilder
    var inSi = false
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => inSi = true; cur.clear()
            case "t" if inSi => inT = true
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "si" => inSi = false; out += cur.toString
            case "t" => inT = false
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    out.result()
  }

  /** A1 column letters → 0-based index ("A"→0, "Z"→25, "AA"→26). */
  private[sources] def colIndex(ref: String): Int = {
    val letters = ref.takeWhile(c => c >= 'A' && c <= 'Z')
    require(letters.nonEmpty, s"bad cell ref '$ref'")
    letters.foldLeft(0)((acc, c) => acc * 26 + (c - 'A' + 1)) - 1
  }

  private def parseWorksheet(xml: Array[Byte],
      shared: IndexedSeq[String]): Seq[Seq[String]] = {
    val r = xmlReader(xml)
    val rows = Seq.newBuilder[Seq[String]]
    var row: scala.collection.mutable.ArrayBuffer[String] = null
    var cellCol = -1
    var cellType = ""
    var inV = false
    var inIsT = false
    val text = new StringBuilder
    def endCell(): Unit = if (cellCol >= 0) {
      while (row.length <= cellCol) row += null // A1-ref gaps stay null
      row(cellCol) = cellType match {
        case "s" => shared(text.toString.trim.toInt)
        case "b" => if (text.toString.trim == "1") "true" else "false"
        case _ => text.toString // n (default), str, inlineStr all surface raw
      }
      cellCol = -1
    }
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" => row = scala.collection.mutable.ArrayBuffer.empty[String]
            case "c" if row != null =>
              val ref = Option(r.getAttributeValue(null, "r"))
              // refless cells (legal, rare) append after the last cell
              cellCol = ref.map(colIndex).getOrElse(row.length)
              cellType = Option(r.getAttributeValue(null, "t")).getOrElse("n")
              text.clear()
            case "v" if cellCol >= 0 => inV = true
            case "t" if cellCol >= 0 && cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || inIsT) text.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "row" if row != null => rows += row.toSeq; row = null
            case "c" => endCell()
            case "v" => inV = false
            case "t" => inIsT = false
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    rows.result()
  }

  /** Distributed read of a directory of .xlsx files:
    * (path, sheet, row_idx, cells array<string> — nulls at A1 gaps),
    * corrupt files surfaced as a single `_corrupt:<reason>` row.
    */
  def readXlsx(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        try sheets(bytes).flatMap(s =>
          s.rows.zipWithIndex.map { case (cells, i) => (p, s.index, i, cells) })
        catch { case e: Exception =>
          Seq((p, -1, -1, Seq(s"_corrupt:${e.getClass.getSimpleName}")))
        }
      }
      .toDF("path", "sheet", "row_idx", "cells")
  }

  /** Minimal valid SpreadsheetML writer — enough structure that this
    * reader and mainstream tooling accept the file. Strings intern into a
    * REAL shared-string table (exercising the `t="s"` index path),
    * numbers land as raw numeric `<v>` cells, booleans as `t="b"`, and
    * `null` cells are OMITTED (exercising the A1-ref gap path). Exists so
    * specs and the driver query parse real zip+XML bytes they build.
    */
  def xlsxBytes(rows: Seq[Seq[Any]]): Array[Byte] = {
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def colRef(i: Int): String = {
      var n = i + 1; val sb = new StringBuilder
      while (n > 0) { val r0 = (n - 1) % 26; sb.insert(0, ('A' + r0).toChar); n = (n - 1) / 26 }
      sb.toString
    }
    val sharedIdx = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    def sidx(s: String): Int = sharedIdx.getOrElseUpdate(s, sharedIdx.size)
    val body = rows.zipWithIndex.map { case (cells, ri) =>
      val cs = cells.zipWithIndex.flatMap { case (v, ci) =>
        val ref = s"${colRef(ci)}${ri + 1}"
        v match {
          case null => None
          case s: String => Some(s"""<c r="$ref" t="s"><v>${sidx(s)}</v></c>""")
          case b: Boolean => Some(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
          case n => Some(s"""<c r="$ref"><v>${n.toString}</v></c>""")
        }
      }.mkString
      s"""<row r="${ri + 1}">$cs</row>"""
    }.mkString
    val S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="$S"><sheetData>$body</sheetData></worksheet>""".stripMargin
    val sstXml = {
      val sis = sharedIdx.keys
        .map(s => s"""<si><t xml:space="preserve">${esc(s)}</t></si>""").mkString
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<sst xmlns="$S" count="${sharedIdx.size}" uniqueCount="${sharedIdx.size}">$sis</sst>""".stripMargin
    }
    val workbookXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="$S" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin
    val wbRels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
        |</Relationships>""".stripMargin
    val rels =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin
    val out = new ByteArrayOutputStream()
    val zout = new ZipOutputStream(out)
    try {
      for ((name, content) <- Seq(
          "[Content_Types].xml" -> contentTypes,
          "_rels/.rels" -> rels,
          "xl/workbook.xml" -> workbookXml,
          "xl/_rels/workbook.xml.rels" -> wbRels,
          "xl/worksheets/sheet1.xml" -> sheetXml,
          "xl/sharedStrings.xml" -> sstXml)) {
        zout.putNextEntry(new ZipEntry(name))
        zout.write(content.getBytes(StandardCharsets.UTF_8))
        zout.closeEntry()
      }
    } finally zout.close()
    out.toByteArray
  }
}
