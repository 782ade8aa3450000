package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Exact row counts from parquet FOOTERS — zero data scan.
  *
  * A plain `df.count()` over parquet still runs a full job (every row
  * group is opened and iterated, even with an empty projection); for
  * sizing decisions that only need the row count of an UNFILTERED scan —
  * SemDeDup's K = ceil(n/target), the honest-broadcast planner rule —
  * the footers already hold the exact number. Footers are KBs each, so
  * this is metadata I/O only, parallelized driver-side across a bounded
  * pool (a 100 TB table is thousands of footers; at ~1 ms apiece that is
  * seconds, vs a cluster-wide scan job).
  *
  * Exactness matters: callers share sizing math with DuckDB oracles
  * (e.g. `semClustersFor`), so an estimate is not acceptable — footer
  * row counts are exact by the parquet spec.
  */
object ParquetMeta {

  private val FooterThreads = 16

  /** Exact total row count of `files` (parquet paths) via footers. */
  def rowCountOfFiles(spark: SparkSession, files: Seq[String]): Long = {
    if (files.isEmpty) return 0L
    val conf = spark.sessionState.newHadoopConf()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(FooterThreads, files.length))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = files.map { f =>
        new java.util.concurrent.Callable[Long] {
          override def call(): Long = {
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(f), conf))
            try reader.getRecordCount finally reader.close()
          }
        }
      }
      pool.invokeAll(tasks.asJava).asScala.map(_.get()).sum
    } finally pool.shutdown()
  }

  /** Exact (row count, per-top-level-column EXPANDED in-memory byte bound)
    * of `files` via footers — metadata-only IO (footers plus, for
    * dictionary-encoded variable-width chunks, their dictionary PAGES —
    * KBs apiece). Per leaf chunk, in preference order:
    *
    *  1. SizeStatistics.unencodedByteArrayDataBytes (parquet-format ≥ 2.10,
    *     written by parquet-mr 1.15+): the EXACT plain-encoded value bytes
    *     of a BYTE_ARRAY chunk, immune to encoding;
    *  2. fixed-width primitives: valueCount × type width — exact expanded
    *     size no matter how the pages are encoded;
    *  3. BYTE_ARRAY without size stats: `total_uncompressed_size` is the
    *     on-page figure, which for a DICTIONARY chunk counts dict + indices
    *     — for a repetitive wide-string column that undercounts the
    *     expanded values by orders of magnitude (ADVICE r12: a 1 KB value
    *     repeated millions of times is ~1-2 B/row on page but 1 KB/row in
    *     a hash relation). When the chunk carries a dictionary page, add
    *     valueCount × (longest dictionary entry) — decoded from the dict
    *     page itself — on top of total_uncompressed_size: a true upper
    *     bound whether or not the chunk also fell back to plain pages.
    *     A dictionary-encoded chunk whose dictionary cannot be read is NOT
    *     PROVABLE and is omitted from the map entirely, so size-bound
    *     callers (the honest-broadcast rule) disqualify it rather than
    *     under-count it.
    *
    * Leaves of a nested column aggregate under their top-level name; a
    * single unprovable leaf in any file makes the whole column unprovable.
    */
  def columnStatsOfFiles(spark: SparkSession,
      files: Seq[String]): (Long, Map[String, Long]) = {
    if (files.isEmpty) return (0L, Map.empty)
    val conf = spark.sessionState.newHadoopConf()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(FooterThreads, files.length))
    try {
      import scala.jdk.CollectionConverters._
      val tasks = files.map { f =>
        new java.util.concurrent.Callable[(Long, Map[String, Option[Long]])] {
          override def call(): (Long, Map[String, Option[Long]]) = {
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(f), conf))
            try {
              val schema = reader.getFooter.getFileMetaData.getSchema
              val cols = reader.getFooter.getBlocks.asScala
                .flatMap(b => b.getColumns.asScala.map(c =>
                  c.getPath.iterator().next() ->
                    chunkExpandedBytes(reader, b, schema, c)))
                .groupMapReduce(_._1)(_._2)(
                  (a, b) => for (x <- a; y <- b) yield x + y)
              (reader.getRecordCount, cols)
            } finally reader.close()
          }
        }
      }
      val parts = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      val rows = parts.map(_._1).sum
      val bytes = parts.flatMap(_._2)
        .groupMapReduce(_._1)(_._2)((a, b) => for (x <- a; y <- b) yield x + y)
        .collect { case (k, Some(v)) => k -> v }
      (rows, bytes)
    } finally pool.shutdown()
  }

  /** Honest expanded-byte bound of one column chunk, None when the footer
    * cannot prove one (see [[columnStatsOfFiles]]).
    */
  private def chunkExpandedBytes(
      reader: ParquetFileReader,
      block: org.apache.parquet.hadoop.metadata.BlockMetaData,
      schema: org.apache.parquet.schema.MessageType,
      c: org.apache.parquet.hadoop.metadata.ColumnChunkMetaData): Option[Long] = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    val sizeStats = Option(c.getSizeStatistics).filter(_.isValid)
      .flatMap { s =>
        val u = s.getUnencodedByteArrayDataBytes
        if (u.isPresent) Some(u.get.longValue()) else None
      }
    lazy val primWidth: Option[Long] = c.getPrimitiveType.getPrimitiveTypeName match {
      case BOOLEAN => Some(1L)
      case INT32 | FLOAT => Some(4L)
      case INT64 | DOUBLE => Some(8L)
      case INT96 => Some(12L)
      case FIXED_LEN_BYTE_ARRAY => Some(c.getPrimitiveType.getTypeLength.toLong)
      case _ => None // BYTE_ARRAY: variable
    }
    lazy val hasDictPages: Boolean =
      Option(c.getEncodingStats) match {
        case Some(es) => es.hasDictionaryEncodedPages
        case None =>
          import org.apache.parquet.column.Encoding
          val e = c.getEncodings
          e.contains(Encoding.PLAIN_DICTIONARY) || e.contains(Encoding.RLE_DICTIONARY)
      }
    // longest dictionary entry, decoded from the dictionary page — every
    // dict-encoded value is one entry, so valueCount × maxEntry bounds the
    // dict-encoded portion; total_uncompressed_size bounds any plain-page
    // fallback portion (plain pages ARE expanded on page). The sum bounds
    // the chunk regardless of the dict/plain split.
    def dictBound: Option[Long] =
      try {
        val desc = schema.getColumnDescription(c.getPath.toArray)
        // upcast: the concrete reader class is package-private, its
        // DictionaryPageReadStore interface is the public API
        val store: org.apache.parquet.column.page.DictionaryPageReadStore =
          reader.getDictionaryReader(block)
        Option(store.readDictionaryPage(desc)).map { page =>
          val dict = new org.apache.parquet.column.values.dictionary
            .PlainValuesDictionary.PlainBinaryDictionary(page)
          val maxEntry = (0 to dict.getMaxId)
            .foldLeft(0L)((m, i) => math.max(m, dict.decodeToBinary(i).length.toLong))
          c.getTotalUncompressedSize + c.getValueCount * maxEntry
        }
      } catch { case _: Exception => None } // unreadable dict: not provable
    sizeStats
      .orElse(primWidth.map(_ * c.getValueCount))
      .orElse(if (hasDictPages) dictBound else Some(c.getTotalUncompressedSize))
  }

  /** Exact row count of the parquet files backing `df` — valid ONLY when
    * `df` is an unfiltered scan (projections are fine; a filter above the
    * scan would make the footer count an overcount, so callers must pass
    * the bare table). Returns None when the frame isn't a single plain
    * file-source scan (then the caller falls back to `count()`).
    */
  def scanRowCount(spark: SparkSession, df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    // walk through row-preserving nodes only: a Filter/Join/Aggregate on
    // the way down disqualifies the footer count
    def unwrap(p: LogicalPlan): Option[LogicalPlan] = p match {
      case Project(_, child) => unwrap(child)
      case SubqueryAlias(_, child) => unwrap(child)
      case other => Some(other)
    }
    unwrap(df.queryExecution.analyzed) match {
      case Some(lr: LogicalRelation) => lr.relation match {
        case fs: HadoopFsRelation
            if fs.fileFormat.toString.toLowerCase.contains("parquet") =>
          Some(rowCountOfFiles(spark, fs.location.inputFiles.toIndexedSeq))
        case _ => None
      }
      case _ => None
    }
  }
}
