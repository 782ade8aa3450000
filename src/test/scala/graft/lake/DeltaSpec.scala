package graft.lake

import java.nio.file.Files

import graft.SparkSpec
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Delta Lake adoption pair ([[DeltaExport]] / [[DeltaImport]]): a graft
  * lineage rendered as a `_delta_log` must read back exactly — current
  * state, any version, from a checkpoint seed or a full JSON replay —
  * with partition values reattaching from `add.partitionValues` alone and
  * remove tombstones actually unlinking files from the scan. Protocol
  * surface pinned per delta-io/delta PROTOCOL.md (public spec).
  */
class DeltaSpec extends SparkSpec {

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def freshCatalog(): LakeCatalog =
    LakeCatalog(spark, Files.createTempDirectory("graft_delta").toString)

  private def tableLoc(cat: LakeCatalog, ns: String, t: String): String =
    new Path(new Path(new Path(cat.root), ns), t).toString

  private def logLines(loc: String, v: Long): Seq[String] = {
    val p = new Path(new Path(loc, "_delta_log"), f"$v%020d.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val in = fs.open(p)
    try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
    finally in.close()
  }

  test("round-trip: imported current version equals the lake read") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 100).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x"))
    cat.write("dl", "t", (101 to 200).map(i => (i.toLong, s"v$i", i * 1.5)).toDF("id", "v", "x"),
      SaveMode.Append)
    val exp = DeltaExport.export(spark, cat, "dl", "t")
    assert(exp.lastDeltaVersion == 1L)
    val imported = DeltaImport.read(spark, tableLoc(cat, "dl", "t"))
    assert(imported.columns.toSeq == Seq("id", "v", "x"))
    assert(rows(imported) == rows(cat.read("dl", "t").select("id", "v", "x")))
  }

  test("version 0 carries protocol + metaData with the Spark-JSON schemaString") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    cat.write("dl", "t", df)
    DeltaExport.export(spark, cat, "dl", "t")
    val lines = logLines(tableLoc(cat, "dl", "t"), 0L)
    assert(lines.exists(_.contains("\"protocol\"")))
    assert(lines.exists(_.contains("\"minReaderVersion\":1")))
    val meta = lines.find(_.contains("\"metaData\"")).get
    assert(meta.contains("\"provider\":\"parquet\""))
    // schemaString is the Spark StructType JSON (the spec's own format)
    assert(meta.contains("schemaString"))
    assert(meta.contains("struct"))
    assert(lines.exists(l => l.contains("\"add\"") && l.contains("numRecords")))
  }

  test("CoW delete exports remove tombstones and the import honors them") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 50).map(i => (i.toLong, i * 2.0)).toDF("id", "x"))
    cat.write("dl", "t", (51 to 100).map(i => (i.toLong, i * 2.0)).toDF("id", "x"),
      SaveMode.Append)
    cat.delete("dl", "t", col("id") % 5 === 0)
    DeltaExport.export(spark, cat, "dl", "t")
    val loc = tableLoc(cat, "dl", "t")
    val lines = logLines(loc, 2L)
    assert(lines.exists(_.contains("\"remove\"")), "delete commit must tombstone files")
    val imported = DeltaImport.read(spark, loc)
    assert(imported.filter(col("id") % 5 === 0).count() == 0)
    assert(rows(imported) == rows(cat.read("dl", "t").select("id", "x")))
    // the tombstoned files must not be scanned at the current version
    val live = DeltaImport.read(spark, loc).inputFiles.toSet
    val v1files = DeltaImport.read(spark, loc, Some(1L)).inputFiles.toSet
    assert(live.nonEmpty && live != v1files)
  }

  test("time travel: each Delta version reproduces its graft snapshot") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 30).map(i => (i.toLong, s"a$i")).toDF("id", "v"))
    cat.write("dl", "t", (31 to 60).map(i => (i.toLong, s"a$i")).toDF("id", "v"),
      SaveMode.Append)
    cat.delete("dl", "t", col("id") <= 10)
    DeltaExport.export(spark, cat, "dl", "t")
    val loc = tableLoc(cat, "dl", "t")
    assert(rows(DeltaImport.read(spark, loc, Some(0L))) ==
      rows(cat.read("dl", "t", Some(1)).select("id", "v")))
    assert(rows(DeltaImport.read(spark, loc, Some(1L))) ==
      rows(cat.read("dl", "t", Some(2)).select("id", "v")))
    assert(rows(DeltaImport.read(spark, loc, Some(2L))) ==
      rows(cat.read("dl", "t", Some(3)).select("id", "v")))
  }

  test("partition values reattach from add.partitionValues with schema casts") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 60).map(i => (i.toLong, i % 3, s"p${i % 3}", i * 2.0))
      .toDF("id", "bucket", "tag", "x")
    cat.write("dl", "p", df, partitionBy = Seq("bucket", "tag"))
    DeltaExport.export(spark, cat, "dl", "p")
    val loc = tableLoc(cat, "dl", "p")
    val lines = logLines(loc, 0L)
    assert(lines.exists(l => l.contains("\"partitionValues\"") &&
      l.contains("\"bucket\"") && l.contains("\"tag\"")),
      "partition tuple must live in add.partitionValues")
    // schemaString carries the discovered partition types (bucket int,
    // tag string), so the import casts the reattached strings back and
    // the round-trip is type-identical to the lake read
    val imported = DeltaImport.read(spark, loc).select("id", "x", "bucket", "tag")
    assert(rows(imported) == rows(cat.read("dl", "p").select("id", "x", "bucket", "tag")))
  }

  test("partitionEq prunes files at planning time; unknown keys are loud") {
    import spark.implicits._
    val cat = freshCatalog()
    val df = (1 to 60).map(i => (i.toLong, i % 3, i * 2.0)).toDF("id", "bucket", "x")
    cat.write("dl", "p", df, partitionBy = Seq("bucket"))
    DeltaExport.export(spark, cat, "dl", "p")
    val loc = tableLoc(cat, "dl", "p")
    val full = DeltaImport.read(spark, loc)
    val pruned = DeltaImport.read(spark, loc, partitionEq = Map("bucket" -> "1"))
    assert(rows(pruned) == rows(full.filter(col("bucket") === 1)))
    // pruning happens at PLANNING time: the other partitions' files never
    // reach the scan
    val prunedFiles = pruned.inputFiles.toSet
    val fullFiles = full.inputFiles.toSet
    assert(prunedFiles.nonEmpty && prunedFiles.subsetOf(fullFiles)
      && prunedFiles.size < fullFiles.size)
    assert(prunedFiles.forall(_.contains("bucket=1")))
    val e = intercept[IllegalArgumentException] {
      DeltaImport.read(spark, loc, partitionEq = Map("nope" -> "1"))
    }
    assert(e.getMessage.contains("not partition columns"))
    // a value matching no partition returns an empty, correctly-typed frame
    val none = DeltaImport.read(spark, loc, partitionEq = Map("bucket" -> "9"))
    assert(none.count() == 0 && none.schema == full.schema)
  }

  test("checkpoint seed + JSON tail equals full JSON replay") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 40).map(i => (i.toLong, i * 1.0)).toDF("id", "x"))
    cat.write("dl", "t", (41 to 80).map(i => (i.toLong, i * 1.0)).toDF("id", "x"),
      SaveMode.Append)
    cat.delete("dl", "t", col("id") % 4 === 0) // post-checkpoint tombstones
    val exp = DeltaExport.export(spark, cat, "dl", "t")
    val loc = tableLoc(cat, "dl", "t")
    val viaJson = rows(DeltaImport.read(spark, loc))
    DeltaExport.checkpoint(spark, exp.logDir, 1L)
    val fs = new Path(exp.logDir).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.exists(new Path(exp.logDir, f"${1L}%020d.checkpoint.parquet")))
    assert(fs.exists(new Path(exp.logDir, "_last_checkpoint")))
    // current read now seeds from the checkpoint and must still apply the
    // version-2 remove tombstones from the JSON tail
    val viaCheckpoint = rows(DeltaImport.read(spark, loc))
    assert(viaCheckpoint == viaJson)
    // below-checkpoint time travel ignores the checkpoint (pure replay)
    assert(rows(DeltaImport.read(spark, loc, Some(0L))) ==
      rows(cat.read("dl", "t", Some(1)).select("id", "x")))
  }

  test("schema evolution emits a fresh metaData action at the evolving version") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 10).map(i => (i.toLong, s"v$i")).toDF("id", "v"))
    cat.write("dl", "t", (11 to 20).map(i => (i.toLong, s"v$i", i * 1.0)).toDF("id", "v", "x"),
      SaveMode.Append)
    DeltaExport.export(spark, cat, "dl", "t")
    val loc = tableLoc(cat, "dl", "t")
    assert(logLines(loc, 1L).exists(_.contains("\"metaData\"")),
      "schema change must re-emit metaData")
    val imported = DeltaImport.read(spark, loc)
    assert(imported.columns.contains("x"))
    assert(imported.filter(col("id") <= 10).agg(sum(when(col("x").isNull, 1)))
      .collect()(0).getLong(0) == 10L)
  }

  test("merge-on-read deletes export as REAL deletion vectors; import applies them") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 200).map(i => (i.toLong, i * 1.0)).toDF("id", "x"))
    cat.deleteMoR("dl", "t", col("id") % 3 === 0)
    val exp = DeltaExport.export(spark, cat, "dl", "t")
    assert(exp.lastDeltaVersion == 1L)
    val loc = tableLoc(cat, "dl", "t")
    // protocol carries the table feature; the DV commit re-emits adds with
    // inline Z85 descriptors and removes nothing (no data rewrite)
    val v0 = logLines(loc, 0L)
    assert(v0.exists(_.contains("\"minReaderVersion\":3")))
    assert(v0.exists(_.contains("deletionVectors")))
    val v1 = logLines(loc, 1L)
    assert(v1.exists(l => l.contains("\"deletionVector\"") &&
      l.contains("\"storageType\":\"i\"") && l.contains("\"cardinality\"")))
    assert(!v1.exists(_.contains("\"remove\"")))
    val imported = DeltaImport.read(spark, loc)
    assert(imported.filter(col("id") % 3 === 0).count() == 0)
    assert(rows(imported) == rows(cat.read("dl", "t").select("id", "x")))
    // time travel below the DV commit still sees every row
    assert(DeltaImport.read(spark, loc, Some(0L)).count() == 200)
  }

  test("stacked MoR deletes re-emit the add with the merged vector; checkpoint carries it") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 300).map(i => (i.toLong, i * 1.0)).toDF("id", "x"))
    cat.deleteMoR("dl", "t", col("id") % 5 === 0)
    cat.deleteMoR("dl", "t", col("id") % 7 === 0)
    val exp = DeltaExport.export(spark, cat, "dl", "t")
    val loc = tableLoc(cat, "dl", "t")
    val expect = rows(cat.read("dl", "t").select("id", "x"))
    assert(rows(DeltaImport.read(spark, loc)) == expect)
    // each stacked delete is its own faithful Delta version
    assert(DeltaImport.read(spark, loc, Some(1L))
      .filter(col("id") % 7 === 0 && col("id") % 5 =!= 0).count() > 0)
    // a checkpoint at the tip persists the DV descriptor in the add struct
    DeltaExport.checkpoint(spark, exp.logDir, exp.lastDeltaVersion)
    assert(rows(DeltaImport.read(spark, loc)) == expect)
  }

  test("oversize vectors land in a uuid-named .bin sidecar with CRC framing") {
    import spark.implicits._
    val cat = freshCatalog()
    cat.write("dl", "t", (1 to 5000).map(i => (i.toLong, i * 1.0)).toDF("id", "x"))
    cat.deleteMoR("dl", "t", col("id") % 2 === 0)
    // force the file path by making every blob oversize
    DeltaExport.export(spark, cat, "dl", "t", inlineDvMax = 8)
    val loc = tableLoc(cat, "dl", "t")
    val lines = logLines(loc, 1L)
    assert(lines.exists(l => l.contains("\"storageType\":\"u\"") &&
      l.contains("\"offset\":1")))
    val fs = new Path(loc).getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.listStatus(new Path(loc)).exists(
      _.getPath.getName.startsWith("deletion_vector_")))
    val imported = DeltaImport.read(spark, loc)
    assert(imported.filter(col("id") % 2 === 0).count() == 0)
    assert(rows(imported) == rows(cat.read("dl", "t").select("id", "x")))
  }
}
