package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._
import scala.util.Using

import graft.sources.SchemaTools
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Lakehouse table layer: namespaces, managed tables, snapshot versioning
  * and time travel over parquet — the reference's Iceberg surface
  * (utils/spark_write_iceberg.py, utils/catalog_manager.py) re-expressed
  * without an Iceberg runtime (none ships in this environment).
  *
  * Layout per table:
  * {{{
  *   <root>/<ns>/<table>/manifests/v00001.txt   # one committed version; each
  *                                              # line = a relative data dir
  *   <root>/<ns>/<table>/data/<commit-uuid>/    # parquet files of one commit
  * }}}
  * A version's dataset is the union of its listed data dirs, so APPEND
  * commits reference prior data instead of rewriting it (manifest reuse, the
  * Iceberg idea) — at 100 TB an append writes only the new files plus a
  * few-KB manifest. OVERWRITE starts a fresh file list. Readers pick a
  * manifest (latest or time-travel) and never see half-written commits
  * because the manifest is written last (single-writer; a production
  * multi-writer needs an optimistic-locking catalog, as Iceberg does).
  */
final class LakeCatalog(spark: SparkSession, val root: String) {

  private def nsPath(ns: String): Path = Paths.get(root, ns)
  private def tPath(ns: String, t: String): Path = nsPath(ns).resolve(t)
  private def manifestDir(ns: String, t: String): Path = tPath(ns, t).resolve("manifests")

  // ----- namespace ops (reference: CatalogManager.create_namespace/list) ---

  def createNamespace(ns: String): Unit = Files.createDirectories(nsPath(ns))

  def listNamespaces(): Seq[String] =
    if (!Files.isDirectory(Paths.get(root))) Nil
    else Using.resource(Files.list(Paths.get(root)))(_.iterator.asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted)

  def listTables(ns: String): Seq[String] =
    if (!Files.isDirectory(nsPath(ns))) Nil
    else Using.resource(Files.list(nsPath(ns)))(_.iterator.asScala
      .filter(Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted)

  def tableExists(ns: String, t: String): Boolean = versions(ns, t).nonEmpty

  def dropTable(ns: String, t: String): Unit = deleteRec(tPath(ns, t))

  def rowCount(ns: String, t: String): Long = read(ns, t).count()

  // ----- snapshots -------------------------------------------------------

  def versions(ns: String, t: String): Seq[Int] = {
    val d = manifestDir(ns, t)
    if (!Files.isDirectory(d)) Nil
    else Using.resource(Files.list(d))(_.iterator.asScala.map(_.getFileName.toString)
      .filter(_.matches("v\\d+\\.txt")).map(_.drop(1).dropRight(4).toInt).toSeq.sorted)
  }

  private def manifestEntries(ns: String, t: String, version: Int): Seq[String] =
    Files.readAllLines(manifestDir(ns, t).resolve(f"v$version%05d.txt"), StandardCharsets.UTF_8)
      .asScala.toSeq.filter(_.nonEmpty)

  private def commit(ns: String, t: String, dataDirs: Seq[String]): Int = {
    Files.createDirectories(manifestDir(ns, t))
    val v = versions(ns, t).lastOption.getOrElse(0) + 1
    val tmp = manifestDir(ns, t).resolve(f".v$v%05d.txt.tmp")
    Files.write(tmp, dataDirs.mkString("\n").getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestDir(ns, t).resolve(f"v$v%05d.txt"))
    v
  }

  // ----- read/write ------------------------------------------------------

  /** Read a table at a snapshot (default: latest) — time travel. */
  def read(ns: String, t: String, version: Option[Int] = None): DataFrame = {
    val vs = versions(ns, t)
    require(vs.nonEmpty, s"no such table: $ns.$t")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"no snapshot v$v of $ns.$t (have: ${vs.mkString(",")})")
    val dirs = manifestEntries(ns, t, v).map(rel => tPath(ns, t).resolve(rel).toString)
    // one scan per commit dir (each may carry its own partition layout /
    // schema generation), unified by name — schema evolution across commits.
    SchemaTools.unifySchemas(dirs.map { d =>
      spark.read.option("basePath", d).parquet(d)
    })
  }

  /** Write a commit. OVERWRITE replaces the file list; APPEND extends it
    * (no data rewrite). Optional hive-style partitioning.
    */
  def write(
      ns: String,
      t: String,
      df: DataFrame,
      mode: SaveMode = SaveMode.Overwrite,
      partitionBy: Seq[String] = Nil): Int = {
    createNamespace(ns)
    val commitId = java.util.UUID.randomUUID().toString
    val rel = s"data/$commitId"
    val out = tPath(ns, t).resolve(rel)
    val writer = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(out.toString)
    mode match {
      case SaveMode.Append if tableExists(ns, t) =>
        commit(ns, t, manifestEntries(ns, t, versions(ns, t).last) :+ rel)
      case _ =>
        commit(ns, t, Seq(rel))
    }
  }

  /** Change-data-capture between two snapshots (reference roadmap item
    * "incremental loading (change data capture)"): full-row diff — a row
    * counts as inserted if present in `toV` but not `fromV`, deleted if the
    * reverse; an update is a delete+insert pair. EXCEPT ALL keeps duplicate
    * multiplicity honest. Both sides shuffle once on the full row hash.
    */
  def changelog(ns: String, t: String, fromV: Int, toV: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val before = read(ns, t, Some(fromV))
    val after = read(ns, t, Some(toV))
    after.exceptAll(before).withColumn("_change", lit("insert"))
      .unionByName(before.exceptAll(after).withColumn("_change", lit("delete")))
  }

  /** Compaction (Iceberg OPTIMIZE analog): rewrite the current snapshot's
    * file set as one fresh commit so readers stop paying per-commit scan +
    * union overhead. Data is unchanged; the manifest shrinks to one entry.
    */
  def compact(ns: String, t: String): Int =
    write(ns, t, read(ns, t), SaveMode.Overwrite)

  /** Predicate DELETE (copy-on-write): rows matching `predicate` are
    * removed in a new snapshot; prior snapshots still time-travel to the
    * undeleted data. At scale a production layout prunes the rewrite to
    * affected partitions — snapshot granularity here is the whole table,
    * same as overwrite.
    */
  def delete(ns: String, t: String, predicate: org.apache.spark.sql.Column): Int =
    // NULL-predicate rows are KEPT (SQL DELETE semantics): a row only
    // leaves when the predicate is definitively TRUE.
    write(ns, t,
      read(ns, t).filter(!org.apache.spark.sql.functions.coalesce(
        predicate, org.apache.spark.sql.functions.lit(false))),
      SaveMode.Overwrite)

  /** Incremental read: rows ADDED between two snapshots — the consumer-side
    * half of CDC (a downstream job resumes from its last-seen version and
    * processes only the delta, never re-reading the table).
    */
  def readIncremental(ns: String, t: String, fromV: Int, toV: Int): DataFrame =
    changelog(ns, t, fromV, toV)
      .filter(org.apache.spark.sql.functions.col("_change") === "insert")
      .drop("_change")

  /** Snapshot expiry + vacuum (Iceberg expire_snapshots / Delta VACUUM
    * analog): drop all but the newest `keepLast` manifests, then delete
    * every data dir no surviving manifest references. Bounds metadata AND
    * storage growth — the retention half of table maintenance (compact() is
    * the read-amplification half). Returns the number of data dirs removed.
    */
  def expireSnapshots(ns: String, t: String, keepLast: Int = 1): Int = {
    require(keepLast >= 1, "must keep at least the current snapshot")
    val vs = versions(ns, t)
    require(vs.nonEmpty, s"no such table: $ns.$t")
    val (expired, kept) = vs.splitAt(math.max(0, vs.length - keepLast))
    val keptDirs = kept.flatMap(v => manifestEntries(ns, t, v)).toSet
    val expiredDirs = expired.flatMap(v => manifestEntries(ns, t, v)).toSet -- keptDirs
    expired.foreach(v => Files.deleteIfExists(manifestDir(ns, t).resolve(f"v$v%05d.txt")))
    expiredDirs.foreach(rel => deleteRec(tPath(ns, t).resolve(rel)))
    expiredDirs.size
  }

  private def deleteRec(p: Path): Unit =
    if (Files.exists(p)) {
      Using.resource(Files.walk(p))(_.iterator.asScala.toSeq.reverse.foreach(Files.delete))
    }
}

object LakeCatalog {
  def apply(spark: SparkSession, root: String): LakeCatalog = {
    Files.createDirectories(Paths.get(root))
    new LakeCatalog(spark, root)
  }
}
