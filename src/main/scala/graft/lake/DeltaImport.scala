package graft.lake

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Delta Lake TRANSACTION-LOG READER: reconstructs a table snapshot from a
  * `_delta_log` directory alone — the adoption path in the other
  * direction, no Delta runtime jar, the sibling of [[IcebergImport]].
  * Mechanics per the public protocol (delta-io/delta PROTOCOL.md):
  *
  *  1. if `_last_checkpoint` exists and points at or before the requested
  *     version, seed replay state from `%020d.checkpoint.parquet` (one
  *     bounded read of table STATE, not history) and replay only the JSON
  *     commits after it; otherwise replay `%020d.json` from 0 — the
  *     checkpoint is exactly what keeps log replay O(state), not
  *     O(commits), on long-lived tables;
  *  2. replay semantics: latest `metaData` wins; an `add` upserts its
  *     path into the live file set; a `remove` tombstones it (time travel
  *     = stop replay at the requested version);
  *  3. one Spark parquet scan over the live files; partition columns —
  *     which per the spec exist ONLY in `add.partitionValues`, never in
  *     the data pages — reattach via a broadcast file→tuple map on
  *     `_metadata.file_path`, then everything is projected and cast to
  *     the `schemaString` schema (Spark-JSON, the spec's own format).
  *
  * Replay is driver-side METADATA work bounded by checkpoint size + the
  * JSON tail (Delta's own reader economics); data IO is the one scan plus
  * a file-count-bounded broadcast.
  */
object DeltaImport {

  private val mapper = new ObjectMapper()

  /** A parsed `deletionVector` descriptor (PROTOCOL.md §Deletion Vectors):
    * `storageType` "i" (Z85 inline) or "u" (uuid-named sidecar file).
    */
  final case class DvDescriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  final case class AddState(partitionValues: Map[String, String], size: Long,
      mtime: Long, stats: Option[String], dv: Option[DvDescriptor] = None)

  final case class LogState(
      tableId: String,
      tableName: String,
      schemaJson: String,
      partitionColumns: Seq[String],
      createdTime: Long,
      adds: Map[String, AddState]) {
    def withMeta(id: String, name: String, schema: String, pc: Seq[String],
        created: Long): LogState =
      copy(tableId = id, tableName = name, schemaJson = schema,
        partitionColumns = pc, createdTime = created)
  }

  private[lake] val EmptyState = LogState("", "", null, Nil, 0L, Map.empty)

  /** Read the table at `version` (default: latest committed). `location`
    * is the TABLE directory (the one holding `_delta_log`).
    *
    * `partitionEq` prunes FILES at planning time against the log's
    * `add.partitionValues` (the same move Delta engines make): pruned
    * files never reach the scan, so serving one partition of a 100 TB
    * table costs one partition, not the table. Keys must be declared
    * partition columns (loud otherwise — a typo would silently scan
    * everything).
    */
  def read(spark: SparkSession, location: String,
      version: Option[Long] = None,
      partitionEq: Map[String, String] = Map.empty): DataFrame = {
    val conf = spark.sessionState.newHadoopConf()
    val tableDir = new Path(location)
    val fs = tableDir.getFileSystem(conf)
    val logDir = new Path(tableDir, "_delta_log")
    val have = jsonVersions(fs, logDir)
    require(have.nonEmpty, s"no Delta log at $logDir")
    val v = version.getOrElse(have.last)
    require(have.contains(v),
      s"no Delta version $v at $logDir (have ${have.head}..${have.last})")

    val cp = lastCheckpointVersion(fs, logDir).filter(_ <= v)
    val seed = cp.map(cv => stateFromCheckpoint(spark,
      new Path(logDir, f"$cv%020d.checkpoint.parquet"))).getOrElse(EmptyState)
    val state = replayJson(fs, logDir, cp.map(_ + 1).getOrElse(0L), v, seed)
    require(state.schemaJson != null,
      s"no metaData action in the log up to version $v")
    val schema = DataType.fromJson(state.schemaJson).asInstanceOf[StructType]
    if (partitionEq.nonEmpty) {
      val bad = partitionEq.keySet -- state.partitionColumns.toSet
      require(bad.isEmpty,
        s"partitionEq keys ${bad.mkString(", ")} are not partition columns " +
          s"of this table (${state.partitionColumns.mkString(", ")})")
    }
    val live = state.adds.filter { case (_, a) =>
      partitionEq.forall { case (k, x) => a.partitionValues.get(k).contains(x) }
    }
    if (live.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)

    val files = live.toSeq.sortBy(_._1).map { case (rel, a) =>
      (new Path(tableDir, decodePath(rel)), a.partitionValues)
    }
    // DV resolution stays OUT of the driver's data path entirely: only the
    // bounded descriptors (a Z85 string or a uuid+offset) ship into the
    // dataset; executors resolve blobs (inline decode / "u" sidecar fetch
    // via the broadcast Hadoop conf) and expand positions inside the
    // flatMap — at 100 TB the driver never holds a byte of bitmap
    val dvRows: Seq[(String, String, String, Int, Int)] =
      live.toSeq.sortBy(_._1).collect {
        case (rel, a) if a.dv.isDefined =>
          val d = a.dv.get
          (normalize(new Path(tableDir, decodePath(rel))),
            d.storageType, d.pathOrInlineDv, d.offset.getOrElse(1), d.sizeInBytes)
      }

    // scan with the declared DATA schema (schemaString minus partition
    // columns): files below a schema evolution null-fill their missing
    // columns without a mergeSchema footer sweep — the spec's reader
    // contract (schemaString is authoritative, not the files)
    val dataSchema = StructType(
      schema.fields.filterNot(f => state.partitionColumns.contains(f.name)))
    val raw0 = spark.read.schema(dataSchema).parquet(files.map(_._1.toString): _*)
    val present = raw0.columns.toSet
    val missingPart = state.partitionColumns.filterNot(present.contains)
    // row identity must be captured ON the scan (the `_metadata`
    // pseudo-column does not survive a join) — both the partition
    // reattach and the DV anti-join consume these captured columns
    val needsKey = missingPart.nonEmpty || dvRows.nonEmpty
    val raw =
      if (!needsKey) raw0
      else raw0.withColumn("__delta_fp", normPathCol(col("_metadata.file_path")))
        .withColumn("__delta_pos", col("_metadata.row_index"))
    val withPart =
      if (missingPart.isEmpty) raw
      else {
        val mapSchema = StructType(
          StructField("__delta_fp", StringType) +:
            missingPart.map(StructField(_, StringType)))
        val mapRows = files.map { case (p, pv) =>
          Row.fromSeq(normalize(p) +: missingPart.map(pv.get(_).orNull))
        }
        val lookup = spark.createDataFrame(
          spark.sparkContext.parallelize(mapRows, 1), mapSchema)
        raw.join(broadcast(lookup), "__delta_fp")
      }
    val undeleted =
      if (dvRows.isEmpty) withPart
      else {
        import spark.implicits._
        val confB = spark.sparkContext.broadcast(
          new org.apache.spark.util.SerializableConfiguration(conf))
        val tableDirStr = tableDir.toString
        val dels = spark.createDataset(dvRows)
          .flatMap { case (f, st, pod, off, size) =>
            val td = new Path(tableDirStr)
            val blob = dvBlob(td.getFileSystem(confB.value.value), td,
              DvDescriptor(st, pod, Some(off), size, -1L))
            RoaringDv.deserialize(blob).map(p => (f, p))
          }
          .toDF("__dv_fp", "__dv_pos")
        withPart.join(dels,
          col("__delta_fp") === col("__dv_fp") &&
            col("__delta_pos") === col("__dv_pos"),
          "left_anti")
      }
    undeleted.select(schema.fields.toSeq.map { f =>
      require(undeleted.columns.contains(f.name),
        s"schema column '${f.name}' is in schemaString but in neither the " +
          "data files nor the partition values")
      col(f.name).cast(f.dataType).as(f.name)
    }: _*)
  }

  /** Resolve a descriptor to its bitmap bytes: Z85-decode inline data, or
    * fetch the `deletion_vector_<uuid>.bin` sidecar (seek to `offset`,
    * read the i32-BE size-prefixed blob, verify the trailing CRC32).
    */
  private def dvBlob(fs: FileSystem, tableDir: Path, d: DvDescriptor): Array[Byte] =
    d.storageType match {
      case "i" => RoaringDv.z85Decode(d.pathOrInlineDv).take(d.sizeInBytes)
      case "u" =>
        val idBytes = RoaringDv.z85Decode(d.pathOrInlineDv)
        val bb = java.nio.ByteBuffer.wrap(idBytes)
        val uuid = new java.util.UUID(bb.getLong, bb.getLong)
        val p = new Path(tableDir, s"deletion_vector_$uuid.bin")
        val in = fs.open(p)
        try {
          in.seek(d.offset.getOrElse(1).toLong)
          val din = new java.io.DataInputStream(in)
          val size = din.readInt()
          require(size == d.sizeInBytes,
            s"DV size mismatch at $p: file says $size, descriptor ${d.sizeInBytes}")
          val blob = new Array[Byte](size)
          din.readFully(blob)
          val crc = new java.util.zip.CRC32()
          crc.update(blob)
          val want = din.readInt()
          require(crc.getValue.toInt == want, s"DV checksum mismatch at $p")
          blob
        } finally in.close()
      case x => sys.error(s"unsupported DV storageType '$x'")
    }

  /** Replay `%020d.json` commits `from..to` over `seed`. Shared with
    * [[DeltaExport.checkpoint]] (which persists exactly the state this
    * returns, seeded empty from version 0).
    */
  private[lake] def replayJson(fs: FileSystem, logDir: Path,
      from: Long, to: Long, seed: LogState): LogState = {
    var state = seed
    val adds = scala.collection.mutable.Map[String, AddState](seed.adds.toSeq: _*)
    (from to to).foreach { v =>
      val p = new Path(logDir, f"$v%020d.json")
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      text.split("\n").iterator.map(_.trim).filter(_.nonEmpty).foreach { line =>
        val n = mapper.readTree(line)
        Option(n.get("metaData")).foreach { m =>
          val pc = m.get("partitionColumns")
          state = state.withMeta(
            m.get("id").asText(),
            Option(m.get("name")).map(_.asText()).getOrElse(""),
            m.get("schemaString").asText(),
            (0 until pc.size()).map(pc.get(_).asText()),
            Option(m.get("createdTime")).map(_.asLong()).getOrElse(0L))
        }
        Option(n.get("add")).foreach { a =>
          val pv = Option(a.get("partitionValues")).toSeq.flatMap { node =>
            import scala.jdk.CollectionConverters._
            node.fieldNames().asScala.toSeq.flatMap(k =>
              Option(node.get(k)).filterNot(_.isNull).map(v => k -> v.asText()))
          }.toMap
          val dv = Option(a.get("deletionVector")).filterNot(_.isNull).map { d =>
            DvDescriptor(
              d.get("storageType").asText(),
              d.get("pathOrInlineDv").asText(),
              Option(d.get("offset")).filterNot(_.isNull).map(_.asInt()),
              d.get("sizeInBytes").asInt(),
              d.get("cardinality").asLong())
          }
          adds(a.get("path").asText()) = AddState(pv,
            Option(a.get("size")).map(_.asLong()).getOrElse(0L),
            Option(a.get("modificationTime")).map(_.asLong()).getOrElse(0L),
            Option(a.get("stats")).filterNot(_.isNull).map(_.asText()), dv)
        }
        Option(n.get("remove")).foreach(r => adds.remove(r.get("path").asText()))
      }
    }
    state.copy(adds = adds.toMap)
  }

  /** Seed replay state from a checkpoint parquet — table STATE, O(live
    * files): protocol + latest metaData + net adds, exactly what
    * [[DeltaExport.checkpoint]] persists. One bounded Spark read.
    */
  private def stateFromCheckpoint(spark: SparkSession, file: Path): LogState = {
    val rows = spark.read.parquet(file.toString).collect()
    var state = EmptyState
    val adds = scala.collection.mutable.Map.empty[String, AddState]
    rows.foreach { r =>
      val mi = r.fieldIndex("metaData")
      if (!r.isNullAt(mi)) {
        val m = r.getStruct(mi)
        state = state.withMeta(
          m.getAs[String]("id"),
          Option(m.getAs[String]("name")).getOrElse(""),
          m.getAs[String]("schemaString"),
          Option(m.getAs[scala.collection.Seq[String]]("partitionColumns"))
            .map(_.toSeq).getOrElse(Nil),
          Option(m.getAs[java.lang.Long]("createdTime")).map(_.longValue()).getOrElse(0L))
      }
      val ai = r.fieldIndex("add")
      if (!r.isNullAt(ai)) {
        val a = r.getStruct(ai)
        val pv = Option(a.getAs[scala.collection.Map[String, String]]("partitionValues"))
          .map(_.toMap).getOrElse(Map.empty[String, String])
        val dv = (if (a.schema != null && a.schema.fieldNames.contains("deletionVector"))
            Option(a.getAs[Row]("deletionVector")) else None)
          .map(d => DvDescriptor(
            d.getAs[String]("storageType"), d.getAs[String]("pathOrInlineDv"),
            Option(d.getAs[java.lang.Integer]("offset")).map(_.intValue()),
            d.getAs[Int]("sizeInBytes"), d.getAs[Long]("cardinality")))
        adds(a.getAs[String]("path")) = AddState(pv,
          a.getAs[Long]("size"), a.getAs[Long]("modificationTime"),
          Option(a.getAs[String]("stats")), dv)
      }
    }
    state.copy(adds = adds.toMap)
  }

  /** Versions with a JSON commit file, sorted. */
  private def jsonVersions(fs: FileSystem, logDir: Path): Seq[Long] =
    if (!fs.exists(logDir)) Nil
    else fs.listStatus(logDir).toSeq.map(_.getPath.getName)
      .filter(_.matches("\\d{20}\\.json"))
      .map(_.stripSuffix(".json").toLong).sorted

  private def lastCheckpointVersion(fs: FileSystem, logDir: Path): Option[Long] = {
    val p = new Path(logDir, "_last_checkpoint")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8) finally in.close()
      Some(mapper.readTree(text).get("version").asLong())
    }
  }

  private def normalize(p: Path): String = p.toUri.getPath

  // `_metadata.file_path` rendering differs by scheme (file:/x vs
  // scheme://host/x). Join on the URI PATH both renderings share: strip
  // `scheme://authority`, then `scheme:/` (same treatment as
  // [[IcebergImport.normPathCol]]).
  private def normPathCol(c: Column): Column =
    regexp_replace(
      regexp_replace(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""),
      "^[a-zA-Z][a-zA-Z0-9+.-]*:/", "/")

  /** Spec: `add.path` is percent-encoded. */
  private def decodePath(rel: String): String =
    java.net.URLDecoder.decode(rel, "UTF-8")
}
