package graft.pipeline

import graft.lake.{LakeCatalog, TableMerger}
import graft.sources.MultiFormatReader
import org.apache.spark.sql.SparkSession

/** Per-table outcome of one pipeline run: the staged table's shape plus the
  * merge strategy the catalog applied (reference merge_to_minio.py:180-185
  * prints exactly these fields per table).
  */
final case class TableOutcome(
    table: String,
    format: String,
    sourceRows: Long,
    cols: Int,
    strategy: String,
    finalRows: Long,
    error: Option[String] = None) {
  def ok: Boolean = error.isEmpty
}

/** Whole-run summary (reference main.py "LOADING SUMMARY" + merge summary). */
final case class PipelineReport(
    sourceDir: String,
    namespace: String,
    staged: Int,
    merged: Int,
    failed: Int,
    totalSourceRows: Long,
    outcomes: Seq[TableOutcome]) {

  def render: String = {
    val header =
      f"pipeline: $sourceDir -> ns `$namespace` | staged=$staged merged=$merged " +
        f"failed=$failed rows=$totalSourceRows%,d"
    val lines = outcomes.map { o =>
      val status = if (o.ok) "ok " else "ERR"
      f"  [$status] ${o.table}%-32s [${o.format}%-7s] ${o.sourceRows}%9d rows, " +
        f"${o.cols}%3d cols -> ${o.strategy}${o.error.map(e => s" ($e)").getOrElse("")}"
    }
    (header +: lines).mkString("\n")
  }
}

/** The end-to-end ingestion pipeline — the reference's one-command surface
  * (main.py:16-272 scan-stage-write-verify + merge_to_minio.py:55-228
  * merge-with-strategy-report) composed from the library's own pieces:
  *
  *   1. scan `sourceDir` with per-file isolation (a corrupt or empty file
  *      is reported and skipped, never aborts the batch),
  *   2. merge every staged table into `namespace` of a [[LakeCatalog]]
  *      with auto strategy selection (CTAS / MERGE-upsert / INSERT
  *      OVERWRITE, key auto-detected per the reference candidate list),
  *   3. verify row counts against the catalog and release every parse
  *      cache the scan pinned,
  *
  * returning a [[PipelineReport]] with per-table strategies — a library
  * user gets the reference's pipeline, not just its parts.
  *
  * Scale notes: staging never materializes data (plain declarative scans;
  * the only actions are the per-file row counts), the merges inherit
  * TableMerger's broadcast-friendly anti-join upsert, and because catalog IO
  * is Hadoop-FS-based the same call runs against file:// or s3a:// roots.
  * Per-table failures are isolated exactly like per-file read failures.
  */
object Orchestrator {

  def run(
      spark: SparkSession,
      sourceDir: String,
      catalog: LakeCatalog,
      namespace: String = "lake"): PipelineReport = {
    val staged = MultiFormatReader.loadDirectory(spark, sourceDir)
    val merger = new TableMerger(catalog)
    val outcomes =
      try staged.map { t =>
        try {
          val r = merger.mergeTable(t.df, namespace, t.name)
          TableOutcome(t.name, t.format, t.rows, t.cols, r.strategy, r.finalRows)
        } catch {
          case e: Throwable =>
            TableOutcome(t.name, t.format, t.rows, t.cols, "FAILED", -1L,
              Some(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
        }
      }
      finally MultiFormatReader.release(staged)
    PipelineReport(
      sourceDir = sourceDir,
      namespace = namespace,
      staged = staged.size,
      merged = outcomes.count(_.ok),
      failed = outcomes.count(!_.ok),
      totalSourceRows = staged.map(_.rows).sum,
      outcomes = outcomes)
  }

  /** CLI: `Orchestrator <sourceDir> <lakeRoot> [namespace]` — scan, merge,
    * print the per-table report (the reference's console surface).
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Orchestrator <sourceDir> <lakeRoot> [namespace]")
    val spark = graft.GraftSession.getOrCreate("graft-pipeline")
    val report = run(spark, args(0), LakeCatalog(spark, args(1)),
      if (args.length > 2) args(2) else "lake")
    println(report.render)
    spark.stop()
  }
}
