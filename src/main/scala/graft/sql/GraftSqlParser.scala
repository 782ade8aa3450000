package graft.sql

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** THIN SQL ENTRYPOINT over the lake engine (SURVEY §2 B-layer; VERDICT
  * r12 #9) — the SQL-first surface a user of the reference drives its
  * merges through (reference merge_utils.py:69-104 builds `MERGE INTO`
  * strings and spark.sql()s them against its catalog). Injected via
  * `SparkSessionExtensions.injectParser` (GraftExtensions), so plain
  * `spark.sql(...)` speaks it with no imports:
  *
  *  - `MERGE INTO graft.<ns>.<table> USING <viewOrTable> [ON <keyCol>]`
  *    — lands the source through [[graft.lake.TableMerger]] (strategy
  *    auto-selected, key auto-detected when ON is omitted — the
  *    reference's own semantics);
  *  - `CREATE TABLE graft.<ns>.<table> AS <select…>` — CTAS into a
  *    versioned lake table;
  *  - `INSERT INTO graft.<ns>.<table> <select|VALUES …>` — an append
  *    commit; `UPDATE graft.<ns>.<table> SET <col>=<expr>… [WHERE <pred>]`
  *    and `DELETE FROM graft.<ns>.<table> WHERE <pred>` — the file-scoped
  *    CoW DML pair; `DESCRIBE HISTORY graft.<ns>.<table>` — snapshot
  *    versions with publish times (the Delta idiom);
  *  - maintenance verbs: `OPTIMIZE graft.<ns>.<t> [ZORDER BY (cols)]`
  *    (bin-pack small commits / re-cluster), `VACUUM graft.<ns>.<t>
  *    [RETAIN n VERSIONS]` (snapshot expiry + reclaim), `RESTORE
  *    graft.<ns>.<t> TO VERSION AS OF <n>` (metadata-only rollback);
  *  - any query referencing `graft.<ns>.<table>` — optionally followed by
  *    `VERSION AS OF <n>` or `TIMESTAMP AS OF '<ts>'` for time travel —
  *    reads the lake table: the
  *    reference is rewritten to a temp view backed by the catalog read,
  *    and the REST of the statement stays Spark SQL (joins, CTEs,
  *    filters, whatever), so the façade composes with the full language
  *    instead of re-implementing a dialect.
  *
  * The lake root comes from the session conf `spark.graft.sql.root`
  * (loud when unset). Everything else — including every statement that
  * never mentions `graft.` — delegates verbatim to Spark's parser: the
  * façade is a prefix filter, not a fork.
  */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {

  import GraftSqlParser._

  override def parsePlan(sqlText: String): LogicalPlan =
    interceptStatement(sqlText) match {
      case Some(cmd) => cmd
      case None => delegate.parsePlan(rewriteReads(sqlText))
    }

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewriteReads(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object GraftSqlParser {

  /** Session conf naming the lake root the SQL surface operates on. */
  val RootConf = "spark.graft.sql.root"

  private val Merge =
    """(?is)\s*MERGE\s+INTO\s+graft\.(\w+)\.(\w+)\s+USING\s+([\w.]+)(?:\s+ON\s+(\w+))?\s*;?\s*""".r
  private val Ctas =
    """(?is)\s*CREATE\s+TABLE\s+graft\.(\w+)\.(\w+)\s+AS\s+(.+?)\s*;?\s*""".r
  private val Insert =
    """(?is)\s*INSERT\s+INTO\s+graft\.(\w+)\.(\w+)\s+(.+?)\s*;?\s*""".r
  private val InsertOverwrite =
    """(?is)\s*INSERT\s+OVERWRITE\s+graft\.(\w+)\.(\w+)\s+(.+?)\s*;?\s*""".r
  private val Delete =
    """(?is)\s*DELETE\s+FROM\s+graft\.(\w+)\.(\w+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+graft\.(\w+)\.(\w+)\s*;?\s*""".r
  private val Update =
    """(?is)\s*UPDATE\s+graft\.(\w+)\.(\w+)\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+graft\.(\w+)\.(\w+)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+graft\.(\w+)\.(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+graft\.(\w+)\.(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  // a lake-table reference in TABLE POSITION (after FROM/JOIN), with
  // optional time travel (by version or wall clock). Anchoring on the
  // keyword keeps the rewrite away from string literals and identifiers
  // that merely CONTAIN `graft.x.y` (e.g. a `graft.bucketed.src` table
  // property) — SQL the façade must pass through untouched.
  private val TableRef =
    ("""(?is)\b(FROM|JOIN)(\s+)graft\.(\w+)\.(\w+)""" +
      """(\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""").r

  private def interceptStatement(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case Merge(ns, t, source, key) =>
        Some(GraftMergeCommand(ns, t, source, Option(key)))
      case Ctas(ns, t, select) => Some(GraftCtasCommand(ns, t, select))
      case Update(ns, t, set, where) =>
        Some(GraftUpdateCommand(ns, t, set, Option(where)))
      case InsertOverwrite(ns, t, select) =>
        Some(GraftInsertCommand(ns, t, select, overwrite = true))
      case Insert(ns, t, select) => Some(GraftInsertCommand(ns, t, select))
      case Delete(ns, t, where) => Some(GraftDeleteCommand(ns, t, where))
      case History(ns, t) => Some(GraftHistoryCommand(ns, t))
      case Optimize(ns, t, zorder) =>
        Some(GraftOptimizeCommand(ns, t,
          Option(zorder).map(_.split(",").map(_.trim).toSeq)))
      case Vacuum(ns, t, retain) =>
        Some(GraftVacuumCommand(ns, t, Option(retain).map(_.toInt)))
      case Restore(ns, t, v) => Some(GraftRestoreCommand(ns, t, v.toInt))
      case _ => None
    }

  /** Swap every `graft.ns.t [VERSION AS OF n]` reference for a temp view
    * backed by the catalog read — parse-time resolution, so the delegate
    * parser (and the analyzer) see ordinary SQL. Deterministic view names
    * make re-parsing idempotent.
    */
  private def rewriteReads(sqlText: String): String = {
    if (!TableRef.findFirstIn(sqlText).isDefined) return sqlText
    val spark = SparkSession.getActiveSession.getOrElse(
      return sqlText) // no session (shouldn't happen mid-sql): leave as-is
    TableRef.replaceAllIn(sqlText, m => {
      val (ns, t) = (m.group(3), m.group(4))
      val version = Option(m.group(6)).map(_.toLong)
      val asOf = Option(m.group(7))
      val view = s"graft_${ns}_${t}" + version.fold("")(v => s"_v$v") +
        asOf.fold("")(s => "_t" + java.lang.Integer.toHexString(s.hashCode))
      val df = (version, asOf) match {
        case (Some(v), _) => catalogOf(spark).read(ns, t, Some(v.toInt))
        case (_, Some(ts)) => catalogOf(spark).readAsOf(ns, t, parseAsOf(ts))
        case _ => catalogOf(spark).read(ns, t)
      }
      df.createOrReplaceTempView(view)
      m.group(1) + m.group(2) + view
    })
  }

  /** `TIMESTAMP AS OF` literal: epoch millis when all digits, else the SQL
    * timestamp format (`yyyy-MM-dd[ HH:mm:ss[.f…]]`), interpreted in UTC —
    * the engine's session timezone (GraftSession pins UTC), so SQL time
    * travel and `readAsOf` agree.
    */
  private def parseAsOf(ts: String): Long = {
    val s = ts.trim
    if (s.forall(_.isDigit)) s.toLong
    else {
      val full = if (s.contains(" ") || s.contains("T")) s else s + " 00:00:00"
      java.time.LocalDateTime.parse(full.replace(' ', 'T'))
        .atZone(java.time.ZoneOffset.UTC).toInstant.toEpochMilli
    }
  }

  /** Split on TOP-LEVEL commas only (parens and single-quoted strings are
    * opaque), so `SET a = greatest(b, c), d = 'x,y'` parses as two
    * assignments.
    */
  private[sql] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach { c =>
      if (inStr) { if (c == '\'') inStr = false; cur += c }
      else c match {
        case '\'' => inStr = true; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.result(); cur.clear()
        case _ => cur += c
      }
    }
    out += cur.result()
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private[sql] def catalogOf(spark: SparkSession): graft.lake.LakeCatalog = {
    val root = spark.conf.getOption(RootConf).getOrElse(sys.error(
      s"set $RootConf to the lake root before using graft.<ns>.<table> SQL"))
    graft.lake.LakeCatalog(spark, root)
  }

  private def outCols: Seq[Attribute] = Seq(
    AttributeReference("table", StringType, nullable = false)(),
    AttributeReference("version", LongType, nullable = false)())

  /** `MERGE INTO graft.ns.t USING src [ON key]` — the reference's
    * SQL-first merge surface over [[graft.lake.TableMerger]] (strategy
    * auto-selection and key auto-detection included). Returns
    * (table, new version).
    */
  case class GraftMergeCommand(ns: String, table: String, source: String,
      key: Option[String]) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val merger = new graft.lake.TableMerger(cat)
      merger.mergeTable(spark.table(source), ns, table, key)
      Seq(Row(s"$ns.$table", cat.versions(ns, table).last.toLong))
    }
  }

  /** `CREATE TABLE graft.ns.t AS <select>` — CTAS into a versioned lake
    * table. Returns (table, version 1).
    */
  case class GraftCtasCommand(ns: String, table: String, select: String)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val v = cat.write(ns, table, spark.sql(select))
      Seq(Row(s"$ns.$table", v.toLong))
    }
  }

  /** `INSERT INTO graft.ns.t <select|VALUES …>` — one APPEND commit (no
    * rewrite; manifest-reuse append) — or `INSERT OVERWRITE` — a fresh
    * snapshot replacing the file list (the reference's merge strategy 2,
    * merge_utils.py:46-54), prior versions still time-travelable. The
    * inner query goes back through the session parser, so it may itself
    * read `graft.<ns>.<t>` tables.
    */
  case class GraftInsertCommand(ns: String, table: String, select: String,
      overwrite: Boolean = false) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val v = cat.write(ns, table, spark.sql(select),
        if (overwrite) org.apache.spark.sql.SaveMode.Overwrite
        else org.apache.spark.sql.SaveMode.Append)
      Seq(Row(s"$ns.$table", v.toLong))
    }
  }

  /** `DELETE FROM graft.ns.t WHERE <predicate>` — the FILE-SCOPED CoW
    * delete (only commits holding matches rewrite); the predicate string
    * parses through the session's expression parser.
    */
  case class GraftDeleteCommand(ns: String, table: String, where: String)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val v = cat.delete(ns, table, org.apache.spark.sql.functions.expr(where))
      Seq(Row(s"$ns.$table", v.toLong))
    }
  }

  /** `UPDATE graft.ns.t SET a = expr[, b = expr…] [WHERE pred]` — the
    * FILE-SCOPED CoW UPDATE ([[graft.lake.LakeCatalog.update]]: only
    * commits holding matches rewrite; RHS evaluate against the pre-update
    * row). No WHERE updates every row.
    */
  case class GraftUpdateCommand(ns: String, table: String, set: String,
      where: Option[String]) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      import org.apache.spark.sql.functions.{expr, lit}
      val assignments = splitTop(set).map { a =>
        val i = a.indexOf('=')
        require(i > 0, s"bad SET assignment (need <col> = <expr>): $a")
        (a.take(i).trim, expr(a.drop(i + 1).trim))
      }
      val v = catalogOf(spark).update(ns, table, assignments,
        where.map(expr).getOrElse(lit(true)))
      Seq(Row(s"$ns.$table", v.toLong))
    }
  }

  /** `OPTIMIZE graft.ns.t [ZORDER BY (a, b)]` — table maintenance: plain
    * form bin-packs small commits ([[graft.lake.LakeCatalog.compactSmall]];
    * threshold from `spark.graft.sql.optimize.smallRows`, default 1M rows),
    * ZORDER form re-clusters the snapshot (the Delta OPTIMIZE idioms).
    */
  case class GraftOptimizeCommand(ns: String, table: String,
      zorder: Option[Seq[String]]) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val v = zorder match {
        case Some(cols) => cat.recluster(ns, table, cols)
        case None => cat.compactSmall(ns, table,
          spark.conf.getOption("spark.graft.sql.optimize.smallRows")
            .map(_.toLong).getOrElse(1000000L))
      }
      Seq(Row(s"$ns.$table", v.toLong))
    }
  }

  /** `VACUUM graft.ns.t [RETAIN n VERSIONS]` — snapshot expiry + storage
    * reclaim ([[graft.lake.LakeCatalog.expireSnapshots]], default keep the
    * latest version only). Returns the number of data dirs removed.
    */
  case class GraftVacuumCommand(ns: String, table: String,
      retain: Option[Int]) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Seq(
      AttributeReference("table", StringType, nullable = false)(),
      AttributeReference("removed_dirs", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] = {
      val removed = catalogOf(spark)
        .expireSnapshots(ns, table, retain.getOrElse(1))
      Seq(Row(s"$ns.$table", removed.toLong))
    }
  }

  /** `RESTORE graft.ns.t TO VERSION AS OF n` — metadata-only rollback
    * ([[graft.lake.LakeCatalog.rollback]]): republishes version n's file
    * list as a NEW version, CAS'd against the latest.
    */
  case class GraftRestoreCommand(ns: String, table: String, toVersion: Int)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val v = catalogOf(spark).rollback(ns, table, toVersion)
      Seq(Row(s"$ns.$table", v.toLong))
    }
  }

  /** `DESCRIBE HISTORY graft.ns.t` — (version, publish timestamp,
    * entry count) per surviving snapshot, the Delta idiom over
    * [[graft.lake.LakeCatalog.history]]. Metadata-only.
    */
  case class GraftHistoryCommand(ns: String, table: String)
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = Seq(
      AttributeReference("version", LongType, nullable = false)(),
      AttributeReference("published_at_ms", LongType, nullable = false)(),
      AttributeReference("entries", LongType, nullable = false)())
    override def run(spark: SparkSession): Seq[Row] =
      catalogOf(spark).history(ns, table).map { case (v, ts, n) =>
        Row(v.toLong, ts, n.toLong)
      }
  }
}
