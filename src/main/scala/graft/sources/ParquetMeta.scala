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

  /** Exact (row count, per-top-level-column total UNCOMPRESSED bytes) of
    * `files` via footers — still metadata-only. Column chunk metadata
    * carries `total_uncompressed_size` per leaf; leaves of a nested column
    * aggregate under their top-level name, so the map bounds the bytes a
    * row's column materializes to regardless of nesting. (Known residual
    * undercount: dictionary-encoded chunks report dict + indices, not the
    * expanded values — callers using this to bound in-memory size should
    * treat it as the on-page honest figure, still orders of magnitude
    * closer than a fixed per-type default.)
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
        new java.util.concurrent.Callable[(Long, Map[String, Long])] {
          override def call(): (Long, Map[String, Long]) = {
            val reader = ParquetFileReader.open(
              HadoopInputFile.fromPath(new Path(f), conf))
            try {
              val cols = reader.getFooter.getBlocks.asScala
                .flatMap(_.getColumns.asScala)
                .groupMapReduce(_.getPath.iterator().next())(
                  _.getTotalUncompressedSize)(_ + _)
              (reader.getRecordCount, cols)
            } finally reader.close()
          }
        }
      }
      val parts = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      val rows = parts.map(_._1).sum
      val bytes = parts.flatMap(_._2).groupMapReduce(_._1)(_._2)(_ + _)
      (rows, bytes)
    } finally pool.shutdown()
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
