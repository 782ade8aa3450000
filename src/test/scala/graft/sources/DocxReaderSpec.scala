package graft.sources

import graft.SparkSpec

/** Real .docx ingestion: zip walk + StAX parse, per-file isolation, and
  * the OOXML details that separate a real parser from a lucky one —
  * escaped entities, empty paragraphs, tabs/breaks, multi-run paragraphs.
  */
class DocxReaderSpec extends SparkSpec {

  test("round-trip: written OOXML parses back to the same paragraphs") {
    val paras = Seq("hello world", "", "second & <paragraph>", "tabs\there")
    assert(DocxReader.paragraphs(DocxReader.docxBytes(paras)) == paras)
  }

  test("multi-run paragraphs concatenate; tab/br elements render") {
    // hand-built document.xml: one paragraph split across runs + a tab
    // element + a break element (what real Word output looks like)
    val w = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
    val doc =
      s"""<?xml version="1.0"?><w:document xmlns:w="$w"><w:body>
         |<w:p><w:r><w:t>first</w:t></w:r><w:r><w:tab/><w:t>second</w:t></w:r>
         |<w:r><w:br/><w:t>third</w:t></w:r></w:p>
         |</w:body></w:document>""".stripMargin
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(out)
      z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      z.write(doc.getBytes("UTF-8")); z.closeEntry(); z.close()
      out.toByteArray
    }
    assert(DocxReader.paragraphs(bytes) == Seq("first\tsecond\nthird"))
  }

  test("distributed read: one row per paragraph, corrupt files isolated") {
    val dir = java.nio.file.Files.createTempDirectory("graft_docx")
    java.nio.file.Files.write(dir.resolve("ok.docx"),
      DocxReader.docxBytes(Seq("p1", "p2")))
    java.nio.file.Files.write(dir.resolve("bad.docx"),
      "this is not a zip at all".getBytes("UTF-8"))
    val rows = DocxReader.readDocx(spark, dir.toString)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
    val ok = rows.filter(_._1.endsWith("ok.docx")).sortBy(_._2)
    assert(ok.map(r => (r._2, r._3)).toSeq == Seq((0, "p1"), (1, "p2")))
    val bad = rows.filter(_._1.endsWith("bad.docx"))
    assert(bad.length == 1 && bad.head._2 == -1 && bad.head._3.startsWith("_corrupt:"),
      s"corrupt file must isolate, got ${bad.toSeq}")
  }

  test("XXE hardening: external entities do not resolve") {
    val doc =
      """<?xml version="1.0"?>
        |<!DOCTYPE w:document [<!ENTITY xxe SYSTEM "file:///etc/hostname">]>
        |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
        |<w:body><w:p><w:r><w:t>&xxe;</w:t></w:r></w:p></w:body></w:document>""".stripMargin
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(out)
      z.putNextEntry(new java.util.zip.ZipEntry("word/document.xml"))
      z.write(doc.getBytes("UTF-8")); z.closeEntry(); z.close()
      out.toByteArray
    }
    // either the parser rejects the DTD outright or the entity comes back
    // unresolved — under no circumstances may file content leak through
    val got = try DocxReader.paragraphs(bytes).mkString catch { case _: Exception => "" }
    val leaked = try {
      val host = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/etc/hostname")), "UTF-8").trim
      host.nonEmpty && got.contains(host)
    } catch { case _: Exception => false }
    assert(!leaked, "external entity resolved: XXE")
  }
}
