package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Iceberg v2 import: reading back STRICTLY through the exported metadata
  * (version hint → TableMetadata JSON → Avro manifest lists/manifests →
  * parquet ± position deletes) must reproduce the lake table exactly —
  * current state, any time-traveled snapshot, and tag refs — including
  * identity-partitioned tables whose partition values exist ONLY in the
  * manifests, and the v2 sequence-number rule that scopes a position
  * delete to data files at or below its sequence.
  */
class IcebergImportSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def freshCatalog(): LakeCatalog =
    LakeCatalog(spark, Files.createTempDirectory("graft_ice_imp").toString)

  private def tableLoc(cat: LakeCatalog, ns: String, t: String): String =
    new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(cat.root), ns), t).toString

  test("round-trip: imported current snapshot equals the lake read (MoR deletes applied)") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("ice", "t", (1 to 100).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x"))
    cat.write("ice", "t", (101 to 200).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x"),
      SaveMode.Append)
    cat.deleteMoR("ice", "t", col("id") % 9 === 0)
    IcebergExport.export(spark, cat, "ice", "t")

    val imported = IcebergImport.read(spark, tableLoc(cat, "ice", "t"))
    assert(imported.columns.toSeq == Seq("id", "v", "x"))
    assert(rows(imported) == rows(cat.read("ice", "t").select("id", "v", "x")))
    assert(imported.filter(col("id") % 9 === 0).count() == 0)
  }

  test("identity partition values reattach from manifests with schema types") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 60).map(i => (i.toLong, i % 3, s"p${i % 3}", i * 2.0))
      .toDF("id", "bucket", "tag", "x")
    cat.write("ice", "p", df, partitionBy = Seq("bucket", "tag"))
    IcebergExport.export(spark, cat, "ice", "p")

    val imported = IcebergImport.read(spark, tableLoc(cat, "ice", "p"))
    // partition columns come back typed per the Iceberg schema, not as
    // the strings they rode the manifests in
    assert(imported.schema("bucket").dataType == IntegerType)
    assert(imported.schema("tag").dataType == StringType)
    assert(rows(imported.select("id", "bucket", "tag", "x")) ==
      rows(df.select(col("id"), col("bucket"), col("tag"), col("x"))))
  }

  test("partitioned + MoR deletes COMPOSE: reattachment and anti-join share scan keys") {
    // regression pin: `_metadata` resolves only against the file scan, so
    // capturing row identity after the partition-reattachment join failed
    // with UNRESOLVED_COLUMN — exactly the combination the two
    // single-feature tests above don't exercise together
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 90).map(i => (i.toLong, s"s${i % 3}", i * 1.0)).toDF("id", "status", "x")
    cat.write("ice", "pm", df, partitionBy = Seq("status"))
    cat.deleteMoR("ice", "pm", col("id") % 5 === 0)
    IcebergExport.export(spark, cat, "ice", "pm")

    val imported = IcebergImport.read(spark, tableLoc(cat, "ice", "pm"))
    // column order follows the DECLARED Iceberg schema (hive-read order:
    // partition columns last), not the pre-write frame
    assert(imported.columns.toSeq ==
      IcebergImport.schemaOf(spark, tableLoc(cat, "ice", "pm")).fieldNames.toSeq)
    assert(imported.filter(col("id") % 5 === 0).count() == 0)
    assert(rows(imported.select("id", "status", "x")) ==
      rows(cat.read("ice", "pm").select("id", "status", "x")))
  }

  test("partitionEq prunes at planning time: fewer input files, exact rows, MoR intact") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 120).map(i => (i.toLong, s"s${i % 4}", i * 1.0)).toDF("id", "status", "x")
    cat.write("ice", "pr", df, partitionBy = Seq("status"))
    cat.deleteMoR("ice", "pr", col("id") % 6 === 0)
    IcebergExport.export(spark, cat, "ice", "pr")
    val loc = tableLoc(cat, "ice", "pr")

    val full = IcebergImport.read(spark, loc)
    val one = IcebergImport.read(spark, loc, partitionEq = Map("status" -> "s1"))
    // pruning is in the PLAN, not a filter: the pruned read scans a strict
    // subset of the snapshot's data files
    assert(one.inputFiles.length < full.inputFiles.length,
      s"expected fewer input files: ${one.inputFiles.length} vs ${full.inputFiles.length}")
    assert(rows(one.select("id", "status", "x")) ==
      rows(cat.read("ice", "pr").filter(col("status") === "s1")
        .select("id", "status", "x")))
    assert(one.filter(col("id") % 6 === 0).count() == 0) // deletes still apply

    val err = intercept[IllegalArgumentException] {
      IcebergImport.read(spark, loc, partitionEq = Map("x" -> "1.0"))
    }
    assert(err.getMessage.contains("not identity partition"))
  }

  test("snapshot time travel and tag refs resolve to the exported states") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("ice", "tt", (1 to 50).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    cat.createTag("ice", "tt", "first")
    cat.write("ice", "tt", (51 to 80).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      SaveMode.Append)
    cat.deleteMoR("ice", "tt", col("id") <= 5)
    IcebergExport.export(spark, cat, "ice", "tt")
    val loc = tableLoc(cat, "ice", "tt")

    val snaps = IcebergImport.snapshots(spark, loc)
    assert(snaps.map(_.snapshotId) == Seq(1L, 2L, 3L))
    assert(IcebergImport.refs(spark, loc).get("first").contains(1L))

    assert(IcebergImport.read(spark, loc, snapshotId = Some(1L)).count() == 50)
    assert(rows(IcebergImport.read(spark, loc, ref = Some("first"))) ==
      rows(cat.readTag("ice", "tt", "first").select("id", "v")))
    // current: deletes applied, both appends visible
    val cur = IcebergImport.read(spark, loc)
    assert(cur.count() == 75)
    assert(cur.agg(min("id")).head.getLong(0) == 6L)
  }

  test("sequence rule: rows appended AFTER a delete are untouched by it") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("ice", "seq", (1 to 40).map(i => (i.toLong, "old")).toDF("id", "gen"))
    cat.deleteMoR("ice", "seq", col("id") <= 20) // delete at sequence 2
    cat.write("ice", "seq", (1 to 40).map(i => (i.toLong, "new")).toDF("id", "gen"),
      SaveMode.Append) // same ids, later sequence
    IcebergExport.export(spark, cat, "ice", "seq")

    val cur = IcebergImport.read(spark, tableLoc(cat, "ice", "seq"))
    // old generation lost ids 1-20; new generation keeps all 40
    assert(cur.filter(col("gen") === "old").count() == 20)
    assert(cur.filter(col("gen") === "new").count() == 40)
    assert(rows(cur) == rows(cat.read("ice", "seq").select("id", "gen")))
  }

  test("nested struct/array schema projects with declared Iceberg types") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 20).map(i => (i.toLong, (i * 10L, s"n$i"), Seq(i, i + 1)))
      .toDF("id", "info", "xs")
    cat.write("ice", "n", df)
    IcebergExport.export(spark, cat, "ice", "n")

    val imported = IcebergImport.read(spark, tableLoc(cat, "ice", "n"))
    assert(imported.schema("info").dataType.isInstanceOf[StructType])
    assert(imported.schema("xs").dataType.isInstanceOf[ArrayType])
    assert(rows(imported.select(col("id"), col("info._1"), col("info._2"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x))) ==
      rows(df.select(col("id"), col("info._1"), col("info._2"),
        aggregate(col("xs"), lit(0L), (a, x) => a + x))))
  }

  test("schemaOf inverts the exported schema; unsupported types fail loudly") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = Seq((1L, java.sql.Date.valueOf("2024-03-01"),
      new java.math.BigDecimal("12.34"), Array[Byte](1, 2)))
      .toDF("id", "d", "m", "b")
      .withColumn("m", col("m").cast(DecimalType(10, 2)))
    cat.write("ice", "ty", df)
    IcebergExport.export(spark, cat, "ice", "ty")
    val s = IcebergImport.schemaOf(spark, tableLoc(cat, "ice", "ty"))
    assert(s("id").dataType == LongType)
    assert(s("d").dataType == DateType)
    assert(s("m").dataType == DecimalType(10, 2))
    assert(s("b").dataType == BinaryType)

    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val err = intercept[RuntimeException] {
      IcebergImport.sparkTypeOf(mapper.readTree("\"interval\""))
    }
    assert(err.getMessage.contains("unsupported Iceberg type"))
  }

  // ---- r12: equality deletes (content=2) ---------------------------------

  test("equality deletes: matching rows vanish; the strict sequence rule holds") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("ice", "eq", (1 to 100).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x"))
    cat.write("ice", "eq", (101 to 200).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x"),
      SaveMode.Append)
    val loc = tableLoc(cat, "ice", "eq")
    IcebergExport.export(spark, cat, "ice", "eq")
    // a delete at data-sequence 2: applies ONLY to files with seq < 2 —
    // id 5 (commit 1, seq 1) is removed; id 150 (commit 2, seq 2) SURVIVES
    // even though its key is in the delete file (the spec's strict rule)
    IcebergExport.exportEqualityDelete(spark, loc,
      Seq(5L, 150L).toDF("id"), Seq("id"), deleteSequence = Some(2L))
    val afterFirst = IcebergImport.read(spark, loc)
    assert(afterFirst.filter(col("id") === 5L).count() == 0)
    assert(afterFirst.filter(col("id") === 150L).count() == 1,
      "a delete must never apply to rows committed at or after its sequence")
    assert(afterFirst.count() == 199)
    // a second delete group over a DIFFERENT equality column set, covering
    // everything committed so far (default sequence)
    IcebergExport.exportEqualityDelete(spark, loc, Seq("v7").toDF("v"), Seq("v"))
    val afterSecond = IcebergImport.read(spark, loc)
    assert(afterSecond.filter(col("v") === "v7").count() == 0)
    assert(afterSecond.count() == 198)
    // the PREVIOUS snapshot still time-travels to the pre-delete state
    val snaps = IcebergImport.snapshots(spark, loc).map(_.snapshotId).sorted
    assert(IcebergImport.read(spark, loc, snapshotId = Some(snaps.head)).count() == 100)
  }

  test("equality deletes compose with position deletes and partitions") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 90).map(i => (i.toLong, s"p${i % 3}", i * 2.0)).toDF("id", "k", "x")
    cat.write("ice", "eqp", df, partitionBy = Seq("k"))
    cat.deleteMoR("ice", "eqp", col("id") % 10 === 0) // position deletes
    val loc = tableLoc(cat, "ice", "eqp")
    IcebergExport.export(spark, cat, "ice", "eqp")
    IcebergExport.exportEqualityDelete(spark, loc,
      Seq(7L, 20L).toDF("id"), Seq("id")) // 20 already position-deleted
    val imported = IcebergImport.read(spark, loc)
    val expected = rows(cat.read("ice", "eqp")
      .filter(col("id") =!= 7L).select("id", "k", "x"))
    assert(rows(imported.select("id", "k", "x")) == expected)
    // pruning still holds with a global (tupleless) equality delete around
    val pruned = IcebergImport.read(spark, loc, partitionEq = Map("k" -> "p1"))
    assert(rows(pruned.select("id", "k", "x")) ==
      expected.filter(_(1) == "p1"))
  }

  test("driver cap: distributive manifest planning equals the driver walk") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 120).map(i => (i.toLong, s"p${i % 4}", i * 2.0)).toDF("id", "k", "x")
    cat.write("ice", "cap", df, partitionBy = Seq("k"))
    cat.write("ice", "cap",
      (121 to 160).map(i => (i.toLong, s"p${i % 4}", i * 2.0)).toDF("id", "k", "x"),
      SaveMode.Append, partitionBy = Seq("k"))
    cat.deleteMoR("ice", "cap", col("id") % 11 === 0)
    val loc = tableLoc(cat, "ice", "cap")
    IcebergExport.export(spark, cat, "ice", "cap")
    IcebergExport.exportEqualityDelete(spark, loc, Seq(3L).toDF("id"), Seq("id"))
    val full = rows(IcebergImport.read(spark, loc))
    val part = rows(IcebergImport.read(spark, loc, partitionEq = Map("k" -> "p2")))
    val prop = "graft.iceberg.import.maxDriverFiles"
    sys.props(prop) = "1" // force the executor-side walk
    try {
      assert(rows(IcebergImport.read(spark, loc)) == full)
      assert(rows(IcebergImport.read(spark, loc, partitionEq = Map("k" -> "p2"))) == part)
    } finally sys.props.remove(prop)
  }

  test("NESTED equality ids: a struct-path delete removes matching rows (r13)") {
    import spark.implicits._
    val cat = freshCatalog()
    // a nested primary key (the Flink-CDC shape VERDICT r12 #7 names):
    // rows keyed by meta.k, a struct leaf
    val df = Seq((1L, "k1", 10L), (2L, "k2", 20L), (3L, "k3", 30L), (4L, "k2", 40L))
      .toDF("id", "k", "n")
      .select(col("id"), struct(col("k"), col("n")).as("meta"))
    cat.write("ice", "nested_eq", df)
    val loc = tableLoc(cat, "ice", "nested_eq")
    IcebergExport.export(spark, cat, "ice", "nested_eq")
    val dels = Seq("k2").toDF("x")
      .select(struct(col("x").as("k")).as("meta"))
    IcebergExport.exportEqualityDelete(spark, loc, dels, Seq("meta.k"))
    val imported = IcebergImport.read(spark, loc)
    assert(imported.count() == 2)
    assert(imported.select("meta.k").collect().map(_.getString(0)).toSet ==
      Set("k1", "k3"))
    // an id inside a LIST stays a loud rejection (no row-addressable path)
    val e = intercept[IllegalArgumentException] {
      IcebergExport.exportEqualityDelete(spark, loc, dels, Seq("meta.k.z"))
    }
    assert(e.getMessage.contains("struct-path-addressable"), e.getMessage)
  }

  test("format-version 1 tables read (no sequence numbers, no content field)") {
    import spark.implicits._
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.generic.{GenericData, GenericDatumWriter}
    import org.apache.avro.file.DataFileWriter
    val dir = Files.createTempDirectory("graft_ice_v1_").toString
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    // one data file
    val tmp = Files.createTempDirectory("graft_ice_v1_stage_").resolve("out")
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .coalesce(1).write.parquet(tmp.toString)
    val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp.toString))
      .map(_.getPath).find(_.getName.endsWith(".parquet")).get
    val dataPath = new org.apache.hadoop.fs.Path(dir, "data-0.parquet")
    fs.rename(part, dataPath)
    // a CLASSIC v1 manifest: no content / sequence_number / equality_ids
    val dfSchema: Schema = SchemaBuilder.record("r2").fields()
      .requiredString("file_path").requiredString("file_format")
      .name("partition").`type`(SchemaBuilder.record("r102").fields().endRecord()).noDefault()
      .requiredLong("record_count").requiredLong("file_size_in_bytes")
      .endRecord()
    val entrySchema: Schema = SchemaBuilder.record("manifest_entry").fields()
      .requiredInt("status")
      .name("data_file").`type`(dfSchema).noDefault()
      .endRecord()
    val manifestPath = new org.apache.hadoop.fs.Path(dir, "metadata/m0.avro")
    fs.mkdirs(manifestPath.getParent)
    def writeAvro(p: org.apache.hadoop.fs.Path, schema: Schema,
        recs: Seq[GenericData.Record]): Unit = {
      val w = new DataFileWriter(new GenericDatumWriter[GenericData.Record](schema))
      val out = fs.create(p, true)
      w.create(schema, out)
      recs.foreach(w.append)
      w.close()
    }
    val dfRec = new GenericData.Record(dfSchema)
    dfRec.put("file_path", fs.makeQualified(dataPath).toString)
    dfRec.put("file_format", "PARQUET")
    dfRec.put("partition", new GenericData.Record(dfSchema.getField("partition").schema()))
    dfRec.put("record_count", 3L)
    dfRec.put("file_size_in_bytes", fs.getFileStatus(dataPath).getLen)
    val entry = new GenericData.Record(entrySchema)
    entry.put("status", 1)
    entry.put("data_file", dfRec)
    writeAvro(manifestPath, entrySchema, Seq(entry))
    // a CLASSIC v1 manifest list: no sequence_number / file counts
    val listSchema: Schema = SchemaBuilder.record("manifest_file").fields()
      .requiredString("manifest_path").requiredLong("manifest_length")
      .requiredInt("partition_spec_id").requiredLong("added_snapshot_id")
      .endRecord()
    val listPath = new org.apache.hadoop.fs.Path(dir, "metadata/snap-1.avro")
    val mf = new GenericData.Record(listSchema)
    mf.put("manifest_path", fs.makeQualified(manifestPath).toString)
    mf.put("manifest_length", fs.getFileStatus(manifestPath).getLen)
    mf.put("partition_spec_id", 0)
    mf.put("added_snapshot_id", 1L)
    writeAvro(listPath, listSchema, Seq(mf))
    // CLASSIC v1 metadata: singular `schema`, singular `partition-spec`
    val metaJson =
      s"""{"format-version":1,"table-uuid":"u","location":"$dir",
        "last-updated-ms":0,"last-column-id":2,
        "schema":{"type":"struct","schema-id":0,"fields":[
          {"id":1,"name":"id","required":false,"type":"long"},
          {"id":2,"name":"v","required":false,"type":"string"}]},
        "partition-spec":[],
        "current-snapshot-id":1,
        "snapshots":[{"snapshot-id":1,"timestamp-ms":0,
          "manifest-list":"${fs.makeQualified(listPath)}"}]}"""
    val metaOut = fs.create(new org.apache.hadoop.fs.Path(dir, "metadata/v1.metadata.json"), true)
    try metaOut.write(metaJson.getBytes("UTF-8")) finally metaOut.close()
    val hintOut = fs.create(new org.apache.hadoop.fs.Path(dir, "metadata/version-hint.text"), true)
    try hintOut.write("1".getBytes("UTF-8")) finally hintOut.close()

    val imported = IcebergImport.read(spark, dir)
    assert(imported.columns.toSeq == Seq("id", "v"))
    assert(rows(imported) == Set(Seq(1L, "a"), Seq(2L, "b"), Seq(3L, "c")))
  }

  test("null-safe equality: a null delete value matches null data rows") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = Seq((1L, "a"), (2L, null.asInstanceOf[String]), (3L, "c"), (4L, null.asInstanceOf[String]))
      .toDF("id", "v")
    cat.write("ice", "eqn", df)
    val loc = tableLoc(cat, "ice", "eqn")
    IcebergExport.export(spark, cat, "ice", "eqn")
    IcebergExport.exportEqualityDelete(spark, loc,
      Seq(null.asInstanceOf[String]).toDF("v"), Seq("v"))
    val imported = IcebergImport.read(spark, loc)
    assert(rows(imported) == Set(Seq(1L, "a"), Seq(3L, "c")))
  }
}
