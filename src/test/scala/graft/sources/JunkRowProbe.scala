package graft.sources

import graft.SparkSpec

/** The over-wide-junk-row isolation contract: a mis-delimited row with far
  * more fields than the table keeps landing in the corrupt column — it
  * must never abort the read (Univocity throws TextParsingException past
  * maxColumns, which Spark's PERMISSIVE machinery does NOT catch; the
  * MaxColumnsFloor exists exactly so realistic junk stays under it).
  */
class JunkRowProbe extends SparkSpec {
  test("over-wide junk rows are isolated, not fatal (MaxColumnsFloor)") {
    val d = java.nio.file.Files.createTempDirectory("graft_junk")
    val csv = d.resolve("j.csv")
    val junk = (0 until 300).map(_.toString).mkString(",")
    java.nio.file.Files.writeString(csv, s"a,b,c\n1,2,3\n$junk\n4,5,6\n")
    val df = MultiFormatReader.readCsv(spark, csv.toString)
    assert(df.select("a").collect().map(_.get(0).toString).sorted.toSeq
      == Seq("1", "4"), "junk row must be filtered, good rows kept")
    val san = MultiFormatReader.readCsvSanitized(spark, csv.toString)
    assert(san.select("a").collect().map(_.get(0).toString).sorted.toSeq
      == Seq("1", "4"))
  }
}
