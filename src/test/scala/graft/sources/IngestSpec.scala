package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

class IngestSpec extends SparkSpec {

  test("sanitizeName produces safe identifiers") {
    assert(SchemaTools.sanitizeName("Total Sales ($)") == "Total_Sales")
    assert(SchemaTools.sanitizeName("123abc") == "c_123abc")
    assert(SchemaTools.sanitizeName("a//b..c") == "a_b_c")
    assert(SchemaTools.sanitizeName("___") == "col")
  }

  test("sanitizeColumns dedupes collisions") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("a b", "a-b", "ok")
    val out = SchemaTools.sanitizeColumns(df)
    assert(out.columns.toSeq == Seq("a_b", "a_b_2", "ok"))
  }

  test("sanitizeSchema mirrors sanitizeColumns, types preserved") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a b", IntegerType), StructField("a-b", DoubleType),
      StructField("ok", StringType, nullable = false)))
    val out = SchemaTools.sanitizeSchema(schema)
    assert(out.fields.map(_.name).toSeq == Seq("a_b", "a_b_2", "ok"))
    assert(out.fields.map(_.dataType).toSeq ==
      Seq(IntegerType, DoubleType, StringType))
    assert(!out.fields(2).nullable)
  }

  test("readCsvSanitized: sanitized names fused into the scan, corrupt rows out") {
    val d = Files.createTempDirectory("graft_csv_san")
    Files.writeString(d.resolve("w.csv"),
      "Col A (x),Col-B!\n1,2\n3,4\n\"oops,5\n")
    val df = MultiFormatReader.readCsvSanitized(spark, d.resolve("w.csv").toString)
    assert(df.columns.toSeq == Seq("Col_A_x", "Col_B"))
    // no rename Project above the scan: the analyzed plan's relation
    // already carries the sanitized names. The 2-row result doubles as
    // the corrupt-row check (a bare count() is illegal on the uncached
    // corrupt-filtered scan — the documented contract of this path).
    assert(df.select("Col_A_x").collect().map(_.get(0).toString).sorted.toSeq
      == Seq("1", "3"))
  }

  test("readCsvSanitized quarantine=false drops the same malformed rows") {
    // the r17 wide-ingest fast path: DROPMALFORMED must quarantine-out
    // exactly the row set the corrupt-column filter removes — type
    // conversion failures AND ragged rows — while keeping the sanitized
    // names and inferred types (row-equivalence contract of the
    // quarantine flag; the wide entry's oracle hash rides on it)
    val d = Files.createTempDirectory("graft_csv_dm")
    Files.writeString(d.resolve("w.csv"),
      "Col A (x),Col-B!\n1,2\n3,4\nnotanint,6\n7,8,9,10\n11,12\n")
    // bounded inference (the wide entry's shape) so Col_A_x types as INT
    // and the "notanint" row genuinely fails conversion in both paths
    val iso = MultiFormatReader.readCsvSanitized(spark, d.resolve("w.csv").toString,
      inferRows = 2, multiLine = false)
    val fast = MultiFormatReader.readCsvSanitized(spark, d.resolve("w.csv").toString,
      inferRows = 2, multiLine = false, quarantine = false)
    assert(fast.columns.toSeq == iso.columns.toSeq)
    assert(fast.schema == iso.schema)
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Int, Int)] =
      df.select("Col_A_x", "Col_B").collect()
        .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._1).toSeq
    assert(rows(fast) == rows(iso))
    assert(rows(fast) == Seq((1, 2), (3, 4), (11, 12)))
  }

  test("directory scan isolates corrupt and empty files") {
    val base = Files.createTempDirectory("graft_ingest").toString
    Files.createDirectories(Paths.get(base, "json"))
    Files.createDirectories(Paths.get(base, "csv"))
    Files.writeString(Paths.get(base, "json", "good.json"), """{"id": 1, "name": "x"}""")
    Files.writeString(Paths.get(base, "json", "empty.json"), "")
    Files.writeString(Paths.get(base, "csv", "good.csv"), "a,b\n1,2\n3,4\n")
    val before = org.apache.spark.sql.GraftBridge.numCachedPlans(spark)
    val tables = MultiFormatReader.loadDirectory(spark, base)
    val names = tables.map(_.name).toSet
    assert(names == Set("json_good", "csv_good"), s"got $names")
    assert(tables.find(_.name == "csv_good").get.rows == 2)
    // while pinned, even a bare count() (no real column referenced) is legal
    assert(tables.find(_.name == "json_good").get.df.count() == 1)
    // the release API drops every parse-cache pin the batch created
    MultiFormatReader.release(tables)
    assert(org.apache.spark.sql.GraftBridge.numCachedPlans(spark) == before,
      "release() left parse caches pinned")
    // the returned frames stay queryable (real-column projection) un-cached
    assert(tables.find(_.name == "json_good").get.df
      .select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("corrupt JSON records are filtered, valid ones kept") {
    val d = Files.createTempDirectory("graft_corrupt")
    Files.writeString(d.resolve("mixed.json"),
      "{\"id\": 1}\n{not valid json\n{\"id\": 3}\n")
    val df = MultiFormatReader.readJson(spark, d.resolve("mixed.json").toString,
      multiLine = false)
    val ids = df.select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids == Seq(1L, 3L))
  }

  test("CSV corrupt rows are genuinely filtered (explicit-schema pass)") {
    val d = Files.createTempDirectory("graft_csv_corrupt")
    // row 3 has a dangling quote: malformed under escape/quote rules
    Files.writeString(d.resolve("bad.csv"), "a,b\n1,2\n3,4\n\"oops,5\n")
    val df = MultiFormatReader.readCsv(spark, d.resolve("bad.csv").toString)
    assert(df.count() == 2, df.collect().mkString("|"))
    assert(df.columns.toSeq == Seq("a", "b"))
  }

  test("loadDirectory keeps valid records from a partially corrupt JSON file") {
    val base = Files.createTempDirectory("graft_mixed").toString
    Files.createDirectories(Paths.get(base, "json"))
    // multiLine=true default treats the file as one document; a top-level
    // array with valid rows still loads, and the single-doc corrupt file
    // yields zero rows and is skipped without failing the scan
    Files.writeString(Paths.get(base, "json", "good.json"),
      """[{"id": 1}, {"id": 2}]""")
    Files.writeString(Paths.get(base, "json", "broken.json"), "{not json at all")
    val tables = MultiFormatReader.loadDirectory(spark, base)
    assert(tables.map(_.name) == Seq("json_good"), tables.map(_.name).toString)
    assert(tables.head.rows == 2)
    MultiFormatReader.release(tables)
  }

  test("sanitizeColumns survives adversarial collisions with generated names") {
    import spark.implicits._
    val df = Seq((1, 2, 3)).toDF("a", "a!", "a_2")
    val out = SchemaTools.sanitizeColumns(df)
    assert(out.columns.distinct.length == 3, out.columns.mkString(","))
    assert(out.columns.toSet == Set("a", "a_2", "a_2_2"))
  }

  test("explicit-schema CSV path isolates corrupt rows without inference") {
    import org.apache.spark.sql.types._
    val d = Files.createTempDirectory("graft_csv_schema")
    // dangling quote last: in multiLine mode an unterminated quote swallows
    // everything after it into one corrupt record
    Files.writeString(d.resolve("t.csv"), "a,b\n1,2\nx,4\n\"bad,3\n")
    val schema = StructType(Seq(StructField("a", StringType), StructField("b", IntegerType)))
    val df = MultiFormatReader.readCsvWithSchema(spark, d.resolve("t.csv").toString, schema)
    assert(df.columns.toSeq == Seq("a", "b"))
    assert(df.count() == 2)
  }

  test("CSV reader honors custom delimiter and quoted fields") {
    val d = Files.createTempDirectory("graft_csv")
    Files.writeString(d.resolve("t.csv"), "a;b\n\"x;y\";2\nz;3\n")
    val df = MultiFormatReader.readCsv(spark, d.resolve("t.csv").toString, delimiter = ";")
    assert(df.count() == 2)
    assert(df.columns.toSeq == Seq("a", "b"))
    val first = df.orderBy("b").collect()(0)
    assert(first.getString(0) == "x;y")
  }

  test("unifySchemas null-pads missing columns both directions") {
    import spark.implicits._
    val a = Seq((1, "x")).toDF("id", "name")
    val b = Seq((2, 9.5)).toDF("id", "score")
    val u = SchemaTools.unifySchemas(Seq(a, b))
    assert(u.columns.toSet == Set("id", "name", "score"))
    assert(u.count() == 2)
    assert(u.filter("name IS NULL").count() == 1)
    assert(u.filter("score IS NULL").count() == 1)
  }

  test("sample-bounded inference: same schema and rows as full inference on uniform data") {
    val d = Files.createTempDirectory("graft_csv_bnd")
    val rows = (1 to 200).map(i => s"$i,${i * 1.5},name_$i").mkString("\n")
    Files.writeString(d.resolve("t.csv"), s"Id Col,Val (x),Name\n$rows\n")
    val full = MultiFormatReader.readCsvSanitized(spark, d.resolve("t.csv").toString)
    val bounded = MultiFormatReader.readCsvSanitized(spark, d.resolve("t.csv").toString,
      inferRows = 10)
    assert(bounded.schema == full.schema)
    // collect, not count: any count() prunes the scan down to the corrupt
    // column alone, Spark's documented raw-CSV limitation (see
    // readCsvSanitized's contract)
    assert(bounded.collect().length == 200 && full.collect().length == 200)
    assert(bounded.exceptAll(full).isEmpty)
  }

  test("sample-bounded inference: duplicate per-file headers are dropped from the sample") {
    val d = Files.createTempDirectory("graft_csv_bnd2")
    // two part files, each with its own header — the multi-part layout
    // every distributed CSV writer produces
    Files.writeString(d.resolve("part-0.csv"), "k,v\n1,10\n2,20\n")
    Files.writeString(d.resolve("part-1.csv"), "k,v\n3,30\n4,40\n")
    val df = MultiFormatReader.readCsvSanitized(spark, d.toString, inferRows = 50)
    import org.apache.spark.sql.types.IntegerType
    // a header line leaking into the sample would string-ify both columns
    assert(df.schema.fields.map(_.dataType).toSeq == Seq(IntegerType, IntegerType))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("sample-bounded inference: a data row byte-equal to the header is sample-excluded but still loads") {
    val d = Files.createTempDirectory("graft_csv_bnd4")
    // an all-string table where one legitimate DATA row repeats the header
    // bytes: the row is dropped from the TYPE SAMPLE (indistinguishable
    // from a repeated per-file header) — pinned harmless, because the
    // sample exclusion is sample-only: with string types the row loads
    Files.writeString(d.resolve("t.csv"), "name,tag\nalice,x\nname,tag\nbob,y\n")
    val df = MultiFormatReader.readCsvSanitized(spark, d.resolve("t.csv").toString,
      inferRows = 10)
    import org.apache.spark.sql.types.StringType
    assert(df.schema.fields.map(_.dataType).toSeq == Seq(StringType, StringType))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted.toSeq
    assert(rows == Seq(("alice", "x"), ("bob", "y"), ("name", "tag")),
      s"the header-equal data row must LOAD even though it was sample-excluded: $rows")
  }

  test("sample-bounded inference: header-only (empty) part files don't poison the sample") {
    val d = Files.createTempDirectory("graft_csv_bnd5")
    // a zero-row part file (just the header) listed FIRST — the common
    // distributed-writer artifact; the header-first assumption must hold
    Files.writeString(d.resolve("part-0.csv"), "k,v\n")
    Files.writeString(d.resolve("part-1.csv"), "k,v\n1,10\n2,20\n")
    val df = MultiFormatReader.readCsvSanitized(spark, d.toString, inferRows = 50)
    import org.apache.spark.sql.types.IntegerType
    assert(df.schema.fields.map(_.dataType).toSeq == Seq(IntegerType, IntegerType))
    assert(df.collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("sample-bounded inference: narrow-typed later rows quarantine, never corrupt") {
    val d = Files.createTempDirectory("graft_csv_bnd3")
    val ints = (1 to 50).map(i => s"$i,$i").mkString("\n")
    // row 51's first column is not an int: with the sampled int type it
    // must land in corrupt isolation (dropped), NOT load as garbage
    Files.writeString(d.resolve("t.csv"), s"a,b\n$ints\nnot_an_int,51\n")
    val df = MultiFormatReader.readCsvSanitized(spark, d.resolve("t.csv").toString,
      inferRows = 20)
    assert(df.collect().length == 50)
    assert(df.agg(org.apache.spark.sql.functions.sum("a")).head().getLong(0)
      == (1 to 50).sum.toLong)
  }
}
