package graft.lake

import java.io.ByteArrayOutputStream

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter, SeekableByteArrayInput}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.types._

/** Avro serialization of Iceberg v2 MANIFESTS and MANIFEST LISTS — the
  * binary half of [[IcebergExport]] (reference:
  * utils/spark_write_iceberg.py:8-90 writes real Iceberg tables through
  * the Iceberg runtime; this renders the same container files from the
  * public spec, https://iceberg.apache.org/spec/#manifests).
  *
  * Schemas are hand-authored to the spec's field layout, each field
  * carrying its reserved `field-id` property (status=0, snapshot_id=1,
  * data_file=2, …; manifest_path=500, …) — the ids, not the names, are
  * what an adopting engine binds to. The files are standard Avro object
  * container files written through Apache Avro core (shipped with Spark),
  * with the key-value metadata real readers expect (`schema`,
  * `partition-spec`, `partition-spec-id`, `format-version`, `content`).
  *
  * The partition struct (`r102`) is table-specific: identity-transformed
  * hive partition columns become union-nullable Avro fields typed from
  * the table schema, field-ids 1000+i matching the exported
  * partition-spec.
  */
final class IcebergAvro(partitionFields: Seq[(String, DataType)]) {
  import IcebergAvro._

  private val mapper = new ObjectMapper()

  private def fieldNode(name: String, fieldId: Long, typ: com.fasterxml.jackson.databind.JsonNode,
      optional: Boolean): ObjectNode = {
    val f = mapper.createObjectNode()
    f.put("name", name)
    f.put("field-id", fieldId)
    if (optional) {
      val u = mapper.createArrayNode()
      u.add("null")
      u.add(typ)
      f.set[ObjectNode]("type", u)
      f.putNull("default")
    } else f.set[ObjectNode]("type", typ)
    f
  }

  private def t(s: String) = mapper.getNodeFactory.textNode(s)

  private def record(name: String, fields: Seq[ObjectNode]): ObjectNode = {
    val r = mapper.createObjectNode()
    r.put("type", "record")
    r.put("name", name)
    val arr = r.putArray("fields")
    fields.foreach(arr.add)
    r
  }

  /** Spark type → Avro primitive for a partition value column. */
  private def avroTypeOf(dt: DataType): String = dt match {
    case ByteType | ShortType | IntegerType => "int"
    case LongType => "long"
    case FloatType => "float"
    case DoubleType => "double"
    case BooleanType => "boolean"
    case _ => "string" // dates/timestamps/decimals ride their dir-name string
  }

  /** the table-specific partition struct (empty record when unpartitioned) */
  private val partitionSchemaNode: ObjectNode = record("r102",
    partitionFields.zipWithIndex.map { case ((name, dt), i) =>
      fieldNode(name, 1000L + i, t(avroTypeOf(dt)), optional = true)
    })

  private val equalityIdsNode: ObjectNode = {
    val a = mapper.createObjectNode()
    a.put("type", "array")
    a.put("items", "int")
    a.put("element-id", 136L)
    a
  }

  private val dataFileSchemaNode: ObjectNode = record("r2", Seq(
    fieldNode("content", 134L, t("int"), optional = false),
    fieldNode("file_path", 100L, t("string"), optional = false),
    fieldNode("file_format", 101L, t("string"), optional = false),
    fieldNode("partition", 102L, partitionSchemaNode, optional = false),
    fieldNode("record_count", 103L, t("long"), optional = false),
    fieldNode("file_size_in_bytes", 104L, t("long"), optional = false),
    // spec field 135: equality field ids — present only on equality
    // delete files (content=2)
    fieldNode("equality_ids", 135L, equalityIdsNode, optional = true)))

  private val manifestEntrySchemaNode: ObjectNode = record("manifest_entry", Seq(
    fieldNode("status", 0L, t("int"), optional = false),
    fieldNode("snapshot_id", 1L, t("long"), optional = true),
    fieldNode("sequence_number", 3L, t("long"), optional = true),
    fieldNode("file_sequence_number", 4L, t("long"), optional = true),
    fieldNode("data_file", 2L, dataFileSchemaNode, optional = false)))

  private val manifestFileSchemaNode: ObjectNode = record("manifest_file", Seq(
    fieldNode("manifest_path", 500L, t("string"), optional = false),
    fieldNode("manifest_length", 501L, t("long"), optional = false),
    fieldNode("partition_spec_id", 502L, t("int"), optional = false),
    fieldNode("content", 517L, t("int"), optional = false),
    fieldNode("sequence_number", 515L, t("long"), optional = false),
    fieldNode("min_sequence_number", 516L, t("long"), optional = false),
    fieldNode("added_snapshot_id", 503L, t("long"), optional = false),
    fieldNode("added_files_count", 504L, t("int"), optional = false),
    fieldNode("existing_files_count", 505L, t("int"), optional = false),
    fieldNode("deleted_files_count", 506L, t("int"), optional = false),
    fieldNode("added_rows_count", 512L, t("long"), optional = false),
    fieldNode("existing_rows_count", 513L, t("long"), optional = false),
    fieldNode("deleted_rows_count", 514L, t("long"), optional = false)))

  val manifestEntrySchema: Schema =
    new Schema.Parser().parse(mapper.writeValueAsString(manifestEntrySchemaNode))
  val manifestFileSchema: Schema =
    new Schema.Parser().parse(mapper.writeValueAsString(manifestFileSchemaNode))
  private val dataFileSchema = manifestEntrySchema.getField("data_file").schema()
  private val partitionSchema = dataFileSchema.getField("partition").schema()

  /** one manifest entry record; `partitionValues` are hive dir-name strings */
  def entryRecord(
      status: Int, snapshotId: Long, sequenceNumber: Long,
      content: Int, filePath: String, recordCount: Long, fileSize: Long,
      partitionValues: Seq[(String, Option[String])],
      equalityIds: Seq[Int] = Nil): GenericRecord = {
    val part = new GenericData.Record(partitionSchema)
    partitionValues.foreach { case (k, ov) =>
      val dt = partitionFields.find(_._1 == k).map(_._2)
      part.put(k, ov.map(v => typedValue(v, dt)).orNull)
    }
    val df = new GenericData.Record(dataFileSchema)
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("partition", part)
    df.put("record_count", recordCount)
    df.put("file_size_in_bytes", fileSize)
    if (equalityIds.nonEmpty) {
      val l = new java.util.ArrayList[Integer](equalityIds.length)
      equalityIds.foreach(i => l.add(Int.box(i)))
      df.put("equality_ids", l)
    }
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", status)
    e.put("snapshot_id", snapshotId)
    e.put("sequence_number", sequenceNumber)
    e.put("data_file", df)
    e
  }

  /** A numeric/boolean partition field's Avro union has NO string branch,
    * so an unparseable hive dir value must fail HERE with a clear message
    * — letting the raw string through would crash later inside
    * GenericDatumWriter as an opaque UnresolvedUnionException (and a
    * silent string fallback would emit metadata a real reader rejects).
    * String-typed partitions (dates/decimals/etc. riding their dir names)
    * pass through unchanged — their field IS a string.
    */
  private def typedValue(v: String, dt: Option[DataType]): AnyRef = {
    def bad(kind: String): Nothing = sys.error(
      s"Iceberg export: partition dir value '$v' is not a valid $kind; " +
        "the Avro partition field has no string fallback branch")
    dt match {
      case Some(ByteType | ShortType | IntegerType) =>
        try Int.box(v.toInt) catch { case _: NumberFormatException => bad("int") }
      case Some(LongType) =>
        try Long.box(v.toLong) catch { case _: NumberFormatException => bad("long") }
      case Some(FloatType) =>
        try Float.box(v.toFloat) catch { case _: NumberFormatException => bad("float") }
      case Some(DoubleType) =>
        try Double.box(v.toDouble) catch { case _: NumberFormatException => bad("double") }
      case Some(BooleanType) =>
        if (v == "true" || v == "false") Boolean.box(v.toBoolean) else bad("boolean")
      case _ => v
    }
  }

  /** one manifest-list entry record */
  def manifestFileRecord(
      manifestPath: String, manifestLength: Long, content: Int,
      sequenceNumber: Long, minSequenceNumber: Long, addedSnapshotId: Long,
      addedFiles: Int, existingFiles: Int, addedRows: Long,
      existingRows: Long): GenericRecord = {
    val r = new GenericData.Record(manifestFileSchema)
    r.put("manifest_path", manifestPath)
    r.put("manifest_length", manifestLength)
    r.put("partition_spec_id", 0)
    r.put("content", content)
    r.put("sequence_number", sequenceNumber)
    r.put("min_sequence_number", minSequenceNumber)
    r.put("added_snapshot_id", addedSnapshotId)
    r.put("added_files_count", addedFiles)
    r.put("existing_files_count", existingFiles)
    r.put("deleted_files_count", 0)
    r.put("added_rows_count", addedRows)
    r.put("existing_rows_count", existingRows)
    r.put("deleted_rows_count", 0L)
    r
  }

  /** serialize a MANIFEST: entry records + the metadata keys real readers
    * expect (`schema` = the table's Iceberg schema JSON, `partition-spec`
    * = the spec's fields JSON, `content` = data|deletes)
    */
  def manifestBytes(entries: Seq[GenericRecord], tableSchemaJson: String,
      partitionSpecFieldsJson: String, content: String): Array[Byte] =
    container(manifestEntrySchema, entries, Map(
      "schema" -> tableSchemaJson,
      "partition-spec" -> partitionSpecFieldsJson,
      "partition-spec-id" -> "0",
      "format-version" -> "2",
      "content" -> content))

  /** serialize a MANIFEST LIST for one snapshot */
  def manifestListBytes(files: Seq[GenericRecord], snapshotId: Long,
      parentSnapshotId: Option[Long], sequenceNumber: Long): Array[Byte] =
    container(manifestFileSchema, files, Map(
      "snapshot-id" -> snapshotId.toString,
      "sequence-number" -> sequenceNumber.toString,
      "format-version" -> "2") ++
      parentSnapshotId.map(p => "parent-snapshot-id" -> p.toString))

  private def container(schema: Schema, records: Seq[GenericRecord],
      meta: Map[String, String]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    meta.toSeq.sortBy(_._1).foreach { case (k, v) => w.setMeta(k, v) }
    w.create(schema, out)
    try records.foreach(w.append) finally w.close()
    out.toByteArray
  }
}

object IcebergAvro {

  /** read back an Avro object container file: (records, file metadata) —
    * the minimal spec reader used by the export's own oracle query and
    * specs (and a template for any engine-less consumer)
    */
  def readContainer(fs: FileSystem, p: Path): (Seq[GenericRecord], Map[String, String]) = {
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val r = new DataFileReader[GenericRecord](
      new SeekableByteArrayInput(bytes), new GenericDatumReader[GenericRecord]())
    try {
      import scala.jdk.CollectionConverters._
      val metaKeys = r.getMetaKeys.asScala.toSeq
      val meta = metaKeys.filterNot(_.startsWith("avro.schema"))
        .map(k => k -> r.getMetaString(k)).toMap
      val recs = Seq.newBuilder[GenericRecord]
      while (r.hasNext) recs += r.next()
      (recs.result(), meta)
    } finally r.close()
  }

  /** string field of a generic record (Avro strings read back as Utf8) */
  def str(r: GenericRecord, field: String): String = String.valueOf(r.get(field))

  def long(r: GenericRecord, field: String): Long =
    r.get(field).asInstanceOf[Number].longValue()

  def int(r: GenericRecord, field: String): Int =
    r.get(field).asInstanceOf[Number].intValue()

  def rec(r: GenericRecord, field: String): GenericRecord =
    r.get(field).asInstanceOf[GenericRecord]
}
