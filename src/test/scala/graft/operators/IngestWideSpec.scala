package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the fast wide-CSV writer against the declarative frame definition.
  *
  * `writeWideCsv` exists because generating the corpus through the
  * 4,450-expression projection spent ~30 s single-threaded in projection
  * codegen — 3× the ingest being measured. The two generators must stay
  * byte-equivalent: the ingest_wide_schema oracle re-derives row count,
  * column names (md5) and the global cell sum from first principles, so a
  * drift here would surface as a correctness mismatch in the driver run.
  * This spec catches it earlier and names the generator.
  */
class IngestWideSpec extends SparkSpec {

  test("writeWideCsv read back with header=true equals the declarative wideFrame") {
    val rows = 500L
    val cols = 37
    val dir = Files.createTempDirectory("graft_wide_spec_").toString + "/csv"
    IngestLake.writeWideCsv(spark, rows, cols, dir)

    val expected = IngestLake.wideFrame(spark, rows, cols)
    val back = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(dir)

    assert(back.columns.toSeq == expected.columns.toSeq,
      "headers must match the declarative definition exactly")
    assert(back.count() == rows)
    // exact content equality, order-independent
    assert(back.exceptAll(expected).isEmpty && expected.exceptAll(back).isEmpty,
      "cell values must match v(i,j) = (i+j) % 97")
  }

  test("every part file carries the header line (the per-file header=true contract)") {
    val dir = Files.createTempDirectory("graft_wide_spec_").toString + "/csv"
    IngestLake.writeWideCsv(spark, 100L, 5, dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.length() > 0)
    assert(parts.nonEmpty)
    val header = (0 until 5).map(j => f"Col $j%04d (wide)").mkString(",")
    for (p <- parts) {
      val first = scala.io.Source.fromFile(p)
      try assert(first.getLines().next() == header, s"${p.getName} lacks the header")
      finally first.close()
    }
  }
}
