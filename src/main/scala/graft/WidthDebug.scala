package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** scratch main for bisecting the wide-ingest cliff — not part of the library */
object WidthDebug {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("graft-width-debug")
    spark.sparkContext.setLogLevel("ERROR")
    val cols = args.headOption.map(_.toInt).getOrElse(4450)
    val rows = 50000L
    val csvDir = s"/tmp/graft_scale_wide_$cols"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(csvDir))) {
      operators.IngestLake.writeWideCsv(spark, rows, cols, csvDir)
    }
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[width] $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.1fs")
      r
    }
    val mode = args.drop(1).headOption.getOrElse("full")
    if (mode == "entry") {
      // the exact ingest_wide_schema stages, individually timed
      val root = s"/tmp/graft_width_entry_$cols"
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val csvDir = root + "/wide_csv"
      timed("writeWideCsv") { operators.IngestLake.writeWideCsv(spark, rows, cols, csvDir) }
      val clean = timed("readCsvSanitized(inferRows=1000)") {
        sources.MultiFormatReader.readCsvSanitized(spark, csvDir, inferRows = 1000)
      }
      println(s"[width] inferred types: ${clean.schema.fields.map(_.dataType).distinct.mkString(",")}"
        + s" ncols=${clean.schema.length}")
      val cat = lake.LakeCatalog(spark, root + "/lake")
      timed("lake write") { cat.write("wide", "t", clean) }
      val back = timed("lake read plan") { cat.read("wide", "t") }
      val dataCols = back.columns
      timed("rowsum agg (native)") {
        val rowSum = call_function("graft_row_sum", dataCols.toIndexedSeq.map(col): _*)
        back.agg(org.apache.spark.sql.functions.count(lit(1)), sum(rowSum)).collect()
      }
      spark.stop(); return
    }
    if (mode == "maxcols") {
      val schema = org.apache.spark.sql.types.StructType(
        (0 until cols).map(j => org.apache.spark.sql.types.StructField(
          f"Col $j%04d (wide)", org.apache.spark.sql.types.IntegerType)))
      for (mc <- Seq(cols + 16, 2 * cols, 8192, 16384, 50000)) {
        timed(s"parse maxCols=$mc") {
          spark.read.option("header", "true").option("multiLine", "true")
            .option("maxColumns", mc).schema(schema).csv(csvDir)
            .agg(sum(col(schema.fields.last.name))).collect()
        }
      }
    } else if (mode == "plain") {
      // reference-equivalent ingest: inferred read -> parquet, no
      // corrupt-record isolation
      val pq = s"/tmp/graft_width_plain_$cols"
      timed("plain ingest (infer+write)") {
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("multiLine", "true").option("maxColumns", cols + 16)
          .csv(csvDir)
          .write.mode(SaveMode.Overwrite).parquet(pq)
      }
    } else if (mode == "corrupt-nodrop") {
      // corrupt col in the read schema, but NO filter/drop/rename on top:
      // isolates the parser's corrupt path from the projection stack
      val schema = org.apache.spark.sql.types.StructType(
        (0 until cols).map(j => org.apache.spark.sql.types.StructField(
          f"Col $j%04d (wide)", org.apache.spark.sql.types.IntegerType))
          :+ org.apache.spark.sql.types.StructField("_corrupt_record",
            org.apache.spark.sql.types.StringType))
      val pq = s"/tmp/graft_width_cnd_$cols"
      timed("corrupt-schema read+write") {
        spark.read.option("header", "true").option("multiLine", "true")
          .option("maxColumns", cols + 16)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .schema(schema).csv(csvDir)
          .write.mode(SaveMode.Overwrite).parquet(pq)
      }
    } else {
      val read = timed("readCsv (infer+wrap)") {
        sources.MultiFormatReader.readCsv(spark, csvDir)
      }
      val clean = timed("sanitize") {
        sources.SchemaTools.sanitizeColumns(read.drop(sources.MultiFormatReader.CorruptCol))
      }
      val root = s"/tmp/graft_width_lake_$cols"
      org.apache.hadoop.fs.FileSystem.getLocal(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(root), true)
      val cat = lake.LakeCatalog(spark, root)
      timed("lake write (from csv plan)") { cat.write("wide", "t", clean) }
      timed("lake read count") { cat.read("wide", "t").count() }
    }
    spark.stop()
  }
}
