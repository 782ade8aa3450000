package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** One ingested staging table (reference: schema_manager.load_all_sources
  * returns (df, table_name, source_type, rows, cols) tuples,
  * /root/reference/schema_manager.py:110-140).
  */
final case class IngestedTable(
    df: DataFrame,
    name: String,
    format: String,
    rows: Long,
    cols: Int
)

/** Multi-format safe readers — the reference's core capability
  * (/root/reference/schema_manager.py:18-106) re-expressed Spark-first:
  * each file is read individually with its own schema in PERMISSIVE mode,
  * corrupt records are detected, counted and filtered, and one bad file
  * never aborts the pipeline.
  *
  * Scale notes: readers return plain declarative scans (no caching forced on
  * callers — the reference `.persist()`s everything eagerly, which at 100 TB
  * would pin the cluster's memory; here persistence is the caller's choice).
  * Corrupt-record filtering happens in the same scan, so it's pipelined into
  * whole-stage codegen rather than a second pass.
  */
object MultiFormatReader {

  val CorruptCol = "_corrupt_record"

  /** PERMISSIVE JSON with corrupt-record isolation. multiLine=true matches
    * the reference default (whole-file JSON documents).
    */
  def readJson(spark: SparkSession, path: String, multiLine: Boolean = true): DataFrame = {
    val df = spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .option("multiLine", multiLine)
      .json(path)
    dropCorrupt(df)
  }

  /** A row whose field count exceeds Univocity's maxColumns throws
    * TextParsingException, which Spark's per-record PERMISSIVE machinery
    * does NOT catch — the whole read dies (probe-verified). So the fitted
    * bound below never drops under this floor: junk/mis-delimited rows up
    * to this many fields keep landing in the corrupt column instead of
    * aborting the job, which is the module's isolation contract.
    */
  val MaxColumnsFloor = 8192

  /** Effective Univocity maxColumns for a CSV read: the parser sizes its
    * per-record row buffer from this setting, and on full-field
    * conversion passes an oversized bound is measurable wall time
    * (width-probed at 4,450 real columns: the blanket 50000 cost ~25%
    * end-to-end vs a fitted bound). The bound is derived from the first
    * header line (delimiter count + 1, headroom for ragged rows), never
    * below [[MaxColumnsFloor]] (isolation contract), never above
    * `ceiling` (the caller's maxColumns). An overcount from quoted
    * delimiters is harmless — the value only needs to be ≥ the real
    * width; the floor also covers the undercount edges (a quoted
    * embedded-newline header, a directory whose first file is narrower
    * than its widest) for any table up to the floor's width.
    */
  private def fitMaxColumns(spark: SparkSession, path: String,
      delimiter: String, ceiling: Int): Int = {
    val firstLine =
      try spark.read.textFile(path).head(1).headOption
      catch { case _: Exception => None }
    firstLine match {
      case Some(h) =>
        val cols = h.count(_ == delimiter.head) + 1
        math.min(math.max(cols + cols / 8 + 16, MaxColumnsFloor), ceiling)
      case None => ceiling
    }
  }

  /** PERMISSIVE CSV: header, wide-table support (maxColumns), quoted
    * multi-line fields, corrupt-record isolation.
    *
    * Two passes by necessity: Spark only materializes the corrupt-record
    * column for CSV when it appears in an EXPLICIT schema — with inference
    * alone, malformed rows silently become null-padded rows. So pass 1
    * infers the data schema, pass 2 re-reads with that schema plus the
    * corrupt column appended, and the filter then genuinely isolates bad
    * rows.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      maxColumns: Int = 50000,
      delimiter: String = ",",
      inferSchema: Boolean = true): DataFrame = {
    val inferred = inferCsvSchema(spark, path, maxColumns, delimiter, inferSchema)
    readCsvWithSchema(spark, path, inferred, maxColumns, delimiter)
  }

  /** The shared PERMISSIVE CSV reader configuration (one place, three
    * read paths: inference, schema'd, sanitized).
    */
  private def csvReader(spark: SparkSession, delimiter: String,
      maxCols: Int, multiLine: Boolean = true): org.apache.spark.sql.DataFrameReader =
    spark.read
      .option("header", "true")
      .option("maxColumns", maxCols)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      // multiLine=true (the lossless default) parses quoted embedded
      // newlines but forces whole-file stream parsing: files stop being
      // SPLITTABLE and the per-cell path is ~5x slower (width-probed at
      // 4,450 cols: 18.3s -> 3.6s for the full 50K-row conversion).
      // Callers that know their dialect has no embedded newlines pass
      // multiLine=false — rows with one then quarantine into the corrupt
      // column instead of parsing, so isolation still holds.
      .option("multiLine", multiLine)
      .option("escape", "\"")
      .option("encoding", "UTF-8")

  /** The inference pass: full scan, schema only. */
  private def inferCsvSchema(spark: SparkSession, path: String,
      maxColumns: Int, delimiter: String, inferSchema: Boolean)
      : org.apache.spark.sql.types.StructType =
    csvReader(spark, delimiter, fitMaxColumns(spark, path, delimiter, maxColumns))
      .option("inferSchema", inferSchema)
      .csv(path).schema

  /** SAMPLE-BOUNDED inference: types from the first `sampleRows` data
    * lines only, names from the real header — the wide/large-file fast
    * path (full inference re-parses EVERY cell; on the 50K×4,450
    * reference headline shape that scan alone rivals the whole ingest).
    *
    * The trade, stated plainly: a column whose first `sampleRows` values
    * all parse as a NARROWER type than later values (ints then "abc")
    * gets the narrow type, and the later rows land in the corrupt-record
    * isolation instead of the table. String-ward misses are impossible
    * (string is the widest type), so sampled inference never corrupts
    * values it does load — it can only quarantine rows full inference
    * would have widened for. Callers pick the bound; `Int.MaxValue`
    * keeps exact full-scan inference.
    *
    * Bounded by construction: `limit` stops the text scan after the
    * prefix (one or two leading splits — never a full-file pass), and
    * the collected sample is `sampleRows` lines, a caller-chosen bound.
    * Duplicate header lines (one per part file of a multi-file dir) are
    * dropped from the sample before type inference.
    */
  private def inferCsvSchemaBounded(spark: SparkSession, path: String,
      maxColumns: Int, delimiter: String, sampleRows: Int)
      : org.apache.spark.sql.types.StructType = {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructField, StructType, StringType}
    val maxCols = fitMaxColumns(spark, path, delimiter, maxColumns)
    // sampleRows data lines + up to one header per file seen; the limit
    // is the scan bound, the collect is limit-sized
    val lines = spark.read.textFile(path).limit(sampleRows + 1).collect()
    if (lines.isEmpty) return StructType(Nil)
    // lines.head is the header because textFile lists part files in a
    // stable order and EVERY file of a header=true layout begins with the
    // header (incl. zero-row parts — spec-pinned). Known, accepted edge:
    // a legitimate data row byte-equal to the header is dropped from the
    // TYPE sample as if it were a repeated per-file header — harmless
    // (sample-only: such a row can only exist in an all-string column
    // set, where exclusion can't narrow any type, and it still LOADS).
    val header = lines.head
    val data = lines.iterator.drop(1).filterNot(_ == header).toIndexedSeq
    // names: parse the single header line through the same CSV dialect
    val names = csvReader(spark, delimiter, maxCols)
      .csv(Seq(header).toDS()).columns
    if (data.isEmpty)
      return StructType(names.map(n => StructField(n, StringType)))
    // types: infer over the headerless sample
    val sampled = spark.read
      .option("header", "false")
      .option("maxColumns", maxCols)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("escape", "\"")
      .option("inferSchema", "true")
      .csv(data.toDS())
      .schema
    StructType(names.zipWithIndex.map { case (n, i) =>
      StructField(n,
        if (i < sampled.length) sampled(i).dataType else StringType)
    })
  }

  /** The WIDE-table ingest path: infer, then re-read under the
    * NAME-SANITIZED schema ([[SchemaTools.sanitizeSchema]]) applied
    * positionally (`enforceSchema`, Spark's default) — so header
    * sanitization costs zero extra plan nodes. At 4,000+ columns the
    * alternative (`sanitizeColumns` after the read) stacks a rename
    * `Project` whose one-time whole-projection codegen compilation alone
    * runs tens of seconds (width-probed); a renamed scan schema is free.
    */
  def readCsvSanitized(
      spark: SparkSession,
      path: String,
      maxColumns: Int = 50000,
      delimiter: String = ",",
      inferSchema: Boolean = true,
      inferRows: Int = Int.MaxValue,
      multiLine: Boolean = true,
      quarantine: Boolean = true): DataFrame = {
    val inferred =
      if (inferRows != Int.MaxValue && inferSchema)
        inferCsvSchemaBounded(spark, path, maxColumns, delimiter, inferRows)
      else inferCsvSchema(spark, path, maxColumns, delimiter, inferSchema)
    val sanitized = SchemaTools.sanitizeSchema(inferred)
    if (quarantine)
      // corrupt isolation WITHOUT the dropCorrupt cache: a wide ingest goes
      // straight to a full write, so pinning every cell in columnar storage
      // (plus its per-column codegen) is pure overhead. Contract: reference
      // at least one real data column in the first action (a bare count()
      // on an uncached corrupt-filtered CSV hits Spark's corrupt-column
      // AnalysisException — the documented Spark limitation dropCorrupt's
      // cache shields elsewhere).
      rawCsvWithSchema(spark, path, sanitized, maxColumns, delimiter, multiLine)
        .filter(col(CorruptCol).isNull).drop(CorruptCol)
    else {
      // quarantine=false (r17, guide §2.3/§4 — project before the work):
      // the caller wants malformed rows OUT of the table but will never
      // inspect them, so DROPMALFORMED quarantines the same row set (any
      // row the corrupt column would mark — type-conversion failure,
      // ragged width — is malformed in both spellings) without the
      // per-row corrupt-column materialization, the extra schema column,
      // or the filter+drop projection stack. Width-probed at 4,450 real
      // columns: the full parse+write drops ~8.8 s -> ~4.8 s. Callers
      // that need to SEE the quarantined rows keep the default.
      val w = sanitized.size
      csvReader(spark, delimiter,
          math.min(math.max(w + w / 8 + 16, MaxColumnsFloor), maxColumns),
          multiLine)
        .option("mode", "DROPMALFORMED")
        .schema(sanitized)
        .csv(path)
    }
  }

  /** CSV with a KNOWN schema — the production path for large files: no
    * inference scan, and the corrupt-record column is appended explicitly
    * (required for CSV isolation to work at all). maxColumns is
    * right-sized to the schema width (plus ragged-row headroom, capped by
    * the caller's value) — see [[fitMaxColumns]].
    */
  def readCsvWithSchema(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxColumns: Int = 50000,
      delimiter: String = ",",
      multiLine: Boolean = true): DataFrame =
    dropCorrupt(rawCsvWithSchema(spark, path, schema, maxColumns, delimiter, multiLine))

  /** The corrupt-schema CSV scan before corrupt-row filtering. */
  private def rawCsvWithSchema(
      spark: SparkSession,
      path: String,
      schema: org.apache.spark.sql.types.StructType,
      maxColumns: Int,
      delimiter: String,
      multiLine: Boolean = true): DataFrame = {
    val withCorrupt = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == CorruptCol) :+
        org.apache.spark.sql.types.StructField(CorruptCol,
          org.apache.spark.sql.types.StringType, nullable = true))
    val w = withCorrupt.size
    csvReader(spark, delimiter,
        math.min(math.max(w + w / 8 + 16, MaxColumnsFloor), maxColumns), multiLine)
      .schema(withCorrupt)
      .csv(path)
  }

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** TXT/DOCX-as-lines (reference treats DOCX as line-delimited text). */
  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** XML (reference roadmap item) — Spark 4 native XML source. */
  def readXml(spark: SparkSession, path: String, rowTag: String = "row"): DataFrame =
    spark.read.format("xml").option("rowTag", rowTag).load(path)

  /** JDBC relational source (reference: main.py:18-19 ships the MySQL and
    * Mongo connector jars for exactly this feed) — Spark's JDBC source
    * behind the same contract as the file readers: a declarative scan,
    * no caching forced on callers, one bad source never aborts a batch
    * (wrap with [[ingestJdbc]] for the isolation behavior).
    *
    * Scale: a bare JDBC read is ONE connection and ONE partition no
    * matter how large the cluster — always pass `partitionColumn` +
    * bounds + `numPartitions` for production tables so Spark issues
    * parallel range-predicated queries; Catalyst pushes filters and
    * projections into the remote SQL either way. `table` accepts a table
    * name or a `(SELECT …) alias` pushdown subquery, so the remote
    * database can pre-aggregate scale-proportional feeds before they
    * cross the wire.
    */
  def readJdbc(
      spark: SparkSession,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 0): DataFrame = {
    val base = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    val withProps = properties.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }
    val partitioned = (partitionColumn, lowerBound, upperBound) match {
      case (Some(c), Some(lo), Some(hi)) if numPartitions > 0 =>
        withProps.option("partitionColumn", c)
          .option("lowerBound", lo).option("upperBound", hi)
          .option("numPartitions", numPartitions)
      case _ => withProps
    }
    partitioned.load()
  }

  /** [[readJdbc]] under the per-source isolation contract: a source that
    * fails to connect/read is skipped with a diagnostic, never aborting
    * the batch (the loadDirectory behavior, for relational feeds).
    */
  def ingestJdbc(
      spark: SparkSession,
      name: String,
      url: String,
      table: String,
      properties: Map[String, String] = Map.empty,
      partitionColumn: Option[String] = None,
      lowerBound: Option[Long] = None,
      upperBound: Option[Long] = None,
      numPartitions: Int = 0): Option[IngestedTable] =
    try {
      val df = readJdbc(spark, url, table, properties,
        partitionColumn, lowerBound, upperBound, numPartitions)
      val rows = df.count()
      if (rows == 0) None
      else Some(IngestedTable(df, SchemaTools.sanitizeName(s"jdbc_$name"),
        "JDBC", rows, df.columns.length))
    } catch {
      case e: Throwable =>
        System.err.println(s"[ingest] skipping jdbc source $name: ${e.getMessage}")
        None
    }

  /** MongoDB document source (reference: main.py:19 ships the
    * mongo-spark-connector jar for exactly this feed; no reference code
    * path reads it either) — the seam speaks the official connector's
    * public DataSourceV2 option contract (`connection.uri`, `database`,
    * `collection`), so a deployment that drops the connector jar on the
    * classpath gets the feed with no code change. This environment ships
    * no connector, so format resolution fails and [[ingestMongo]]'s
    * isolation turns that into a skipped source with a diagnostic — the
    * declared-n/a-with-seam treatment (SURVEY §2). The `format` parameter
    * exists so the seam's plumbing is testable against a stub
    * DataSourceV2 (MongoSeamSpec) without the connector.
    *
    * Scale: the real connector plans one input partition per
    * shard/chunk server-side; an `aggregation.pipeline` option pushes
    * filtering/projection into the database before bytes cross the wire —
    * pass both through `extraOptions`.
    */
  def readMongo(
      spark: SparkSession,
      uri: String,
      database: String,
      collection: String,
      extraOptions: Map[String, String] = Map.empty,
      format: String = "mongodb"): DataFrame = {
    val base = spark.read.format(format)
      .option("connection.uri", uri)
      .option("database", database)
      .option("collection", collection)
    extraOptions.foldLeft(base) { case (r, (k, v)) => r.option(k, v) }.load()
  }

  /** [[readMongo]] under the per-source isolation contract: a source whose
    * connector is missing or whose server is unreachable is skipped with a
    * diagnostic, never aborting the batch.
    */
  def ingestMongo(
      spark: SparkSession,
      name: String,
      uri: String,
      database: String,
      collection: String,
      extraOptions: Map[String, String] = Map.empty,
      format: String = "mongodb"): Option[IngestedTable] =
    try {
      val df = readMongo(spark, uri, database, collection, extraOptions, format)
      val rows = df.count()
      if (rows == 0) None
      else Some(IngestedTable(df, SchemaTools.sanitizeName(s"mongo_$name"),
        "MONGO", rows, df.columns.length))
    } catch {
      case e: Throwable =>
        System.err.println(s"[ingest] skipping mongo source $name: ${e.getMessage}")
        None
    }

  private def dropCorrupt(df: DataFrame): DataFrame =
    if (df.columns.contains(CorruptCol)) {
      // cache the FILTERED frame (not the raw parse): Spark disallows raw
      // JSON/CSV queries whose only referenced data column is the internal
      // corrupt-record column (e.g. a bare count() after this filter); the
      // cache is the documented workaround and bounds the re-parse cost.
      // Caching post-filter keeps corrupt rows and the corrupt string column
      // out of storage.
      //
      // CONTRACT: the returned frame is the cached one, and the cache pin is
      // the CALLER's to release (df.unpersist()) once staging/writes
      // complete — but only then: while uncached, a query that references no
      // real data column (a bare count()) hits Spark's corrupt-column
      // AnalysisException that the cache shields. loadDirectory keeps its
      // frames pinned and exposes release(tables) for exactly this reason.
      df.filter(col(CorruptCol).isNull).drop(CorruptCol).cache()
    } else df

  /** Directory scan with per-file isolation: each file becomes its own
    * staging table named `<format>_<stem>`; a file that fails to read (or is
    * empty) is skipped, never aborting the batch — reference behavior
    * (schema_manager.py:118-140, README "Per-file error isolation").
    */
  def loadDirectory(spark: SparkSession, baseDir: String): Seq[IngestedTable] = {
    // Hadoop FS, not java.io: the source dir follows the same scheme
    // contract as the lake catalog (file://, hdfs://, s3a://), so the
    // Orchestrator can ingest straight from object storage.
    import org.apache.hadoop.fs.Path
    val base = new Path(baseDir)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    def files(sub: String, exts: String*): Seq[Path] = {
      val d = new Path(base, sub)
      if (!fs.exists(d)) Nil
      else fs.listStatus(d).toSeq.filter(_.isFile).map(_.getPath)
        .filter(p => exts.exists(e => p.getName.toLowerCase.endsWith(e)))
        .sortBy(_.getName)
    }
    def stem(p: Path): String =
      SchemaTools.sanitizeName(p.getName.replaceAll("\\.[^.]+$", ""))

    def ingest(p: Path, fmt: String, read: String => DataFrame): Option[IngestedTable] = {
      var df: DataFrame = null
      try {
        df = read(p.toString)
        val rows = df.count()
        // The parse cache stays PINNED until the caller is done staging:
        // unpersisting here would hand back a frame whose plan still filters
        // on the internal corrupt-record column, and any downstream query
        // referencing no real data column (a bare count()) then fails
        // analysis. Callers release with MultiFormatReader.release(tables)
        // once writes complete (Orchestrator does; so should batch jobs —
        // otherwise directory ingestion pins every parsed file).
        if (rows == 0) { df.unpersist(); None }
        else Some(IngestedTable(df, s"${fmt.toLowerCase}_${stem(p)}", fmt, rows, df.columns.length))
      } catch {
        case e: Throwable =>
          // a skipped file must not leave its parse cache registered (an
          // all-corrupt file throws on the count AFTER cache registration)
          if (df != null) { try df.unpersist() catch { case _: Throwable => () } }
          System.err.println(s"[ingest] skipping ${p.getName}: ${e.getMessage}")
          None
      }
    }

    files("json", ".json").flatMap(f => ingest(f, "JSON", readJson(spark, _))) ++
      files("csv", ".csv").flatMap(f => ingest(f, "CSV", readCsv(spark, _))) ++
      files("parquet", ".parquet").flatMap(f => ingest(f, "PARQUET", readParquet(spark, _))) ++
      files("orc", ".orc").flatMap(f => ingest(f, "ORC", readOrc(spark, _))) ++
      files("xml", ".xml").flatMap(f => ingest(f, "XML", readXml(spark, _))) ++
      files("docx", ".docx", ".txt").flatMap(f => ingest(f, "TEXT", readText(spark, _)))
  }

  /** Release the parse-cache pins of a loadDirectory batch. Call after the
    * staged tables have been written (or counted for the last time); the
    * frames remain valid for queries that project real data columns.
    */
  def release(tables: Seq[IngestedTable]): Unit =
    tables.foreach(t => try t.df.unpersist() catch { case _: Throwable => () })
}
