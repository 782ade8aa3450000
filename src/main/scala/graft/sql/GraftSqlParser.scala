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
  *  - `MERGE INTO graft.<ns>.<table> [AS] [alias] USING
  *    <viewOrTable|(subquery)> [AS] [alias] [ON <cond>] [WHEN MATCHED
  *    THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *]` — lands the
  *    source through [[graft.lake.TableMerger]] (strategy auto-selected,
  *    key auto-detected when ON is omitted — the reference's own
  *    semantics; multi-column ON runs the composite-key upsert). The
  *    reference's literal emitted statement (merge_utils.py:74-80) —
  *    aliases, qualified backticked ON, both WHEN clauses — parses
  *    verbatim; WHEN shapes with semantics OTHER than SET * / INSERT *
  *    are refused loudly. `USING STREAM graft.<ns>.<src>` (or a subquery
  *    reading `FROM STREAM …`) makes the merge CONTINUOUS (r16): a keyed
  *    streaming pipeline through the native sink's upsert/cdc modes,
  *    Update output, per-destination checkpoint — see
  *    [[GraftSqlParser.GraftMergeCommand]];
  *  - `CREATE TABLE graft.<ns>.<table> [USING <format>] AS <select…>` —
  *    CTAS into a versioned lake table (the format token — the
  *    reference emits `USING iceberg`, merge_utils.py:99-103 — is
  *    accepted; storage is always parquet + versioned manifests, the
  *    layout IcebergExport/DeltaExport can render as either spec);
  *  - `INSERT INTO graft.<ns>.<table> <select|VALUES …>` — an append
  *    commit; `INSERT OVERWRITE [TABLE] graft.<ns>.<table> <select>` —
  *    the reference's overwrite spelling (merge_utils.py:88-91);
  *    `UPDATE graft.<ns>.<table> SET <col>=<expr>… [WHERE <pred>]`
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
  *    instead of re-implementing a dialect;
  *  - `FROM STREAM graft.<ns>.<table>` (r14, the Databricks STREAM
  *    idiom) — the reference becomes a `graft-lake` readStream view, so
  *    the statement plans as a STREAMING DataFrame the caller hands to
  *    `writeStream`: SQL-first continuous reads with snapshot-version
  *    offsets. Source options (changeFeed, maxFilesPerTrigger, …) come
  *    from session confs under `spark.graft.sql.streamOptions.`.
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

  private val MergeHead =
    """(?is)^\s*MERGE\s+INTO\s+graft\.(\w+)\.(\w+)\s+""".r
  // the reference's CTAS carries `USING iceberg` (merge_utils.py:99-103);
  // the format token is accepted and recorded — graft tables are always
  // parquet + versioned manifests, which IS the adoptable-lakehouse layout
  // (IcebergExport/DeltaExport render the same files as either spec)
  private val Ctas =
    """(?is)\s*CREATE\s+TABLE\s+graft\.(\w+)\.(\w+)(?:\s+USING\s+(\w+))?\s+AS\s+(.+?)\s*;?\s*""".r
  private val Insert =
    """(?is)\s*INSERT\s+INTO\s+graft\.(\w+)\.(\w+)\s+(.+?)\s*;?\s*""".r
  // `INSERT OVERWRITE TABLE t SELECT …` is the reference's literal
  // emitted shape (merge_utils.py:88-91); the TABLE keyword is optional
  private val InsertOverwrite =
    """(?is)\s*INSERT\s+OVERWRITE\s+(?:TABLE\s+)?graft\.(\w+)\.(\w+)\s+(.+?)\s*;?\s*""".r
  private val Delete =
    """(?is)\s*DELETE\s+FROM\s+graft\.(\w+)\.(\w+)\s+WHERE\s+(.+?)\s*;?\s*""".r
  private val History =
    """(?is)\s*DESCRIBE\s+HISTORY\s+graft\.(\w+)\.(\w+)\s*;?\s*""".r
  // the SET/WHERE boundary is found by the quote/paren-aware top-level
  // scan, not a lazy regex group: `SET v = 'a WHERE b'` must not split
  // inside the string literal (ADVICE r13)
  private val UpdateHead =
    """(?is)\s*UPDATE\s+graft\.(\w+)\.(\w+)\s+SET\s+(.+?)\s*;?\s*""".r
  private val Optimize =
    """(?is)\s*OPTIMIZE\s+graft\.(\w+)\.(\w+)(?:\s+ZORDER\s+BY\s*\(([^)]+)\))?\s*;?\s*""".r
  private val Vacuum =
    """(?is)\s*VACUUM\s+graft\.(\w+)\.(\w+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*""".r
  private val Restore =
    """(?is)\s*RESTORE\s+graft\.(\w+)\.(\w+)\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
  // a lake-table reference in TABLE POSITION (after FROM/JOIN), with an
  // optional STREAM prefix (continuous read) or time travel (by version
  // or wall clock). Anchoring on the keyword keeps the rewrite away from
  // string literals and identifiers that merely CONTAIN `graft.x.y`
  // (e.g. a `graft.bucketed.src` table property) — SQL the façade must
  // pass through untouched.
  private val TableRef =
    ("""(?is)\b(FROM|JOIN)(\s+)(STREAM\s+)?graft\.(\w+)\.(\w+)""" +
      """(\s+VERSION\s+AS\s+OF\s+(\d+)|\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)')?""").r

  /** Session-conf prefix for options forwarded to `FROM STREAM` reads
    * (`spark.graft.sql.streamOptions.changeFeed=true`,
    * `….maxFilesPerTrigger=64`, …) — the graft-lake source's option
    * surface, SQL-reachable without code.
    */
  val StreamOptionPrefix = "spark.graft.sql.streamOptions."

  /** Session conf naming the CHECKPOINT ROOT for one-statement streaming
    * INSERTs (`INSERT INTO graft.ns.dst SELECT … FROM STREAM
    * graft.ns.src`): each destination's query checkpoints at
    * `<root>/<ns>.<table>`, so re-running the SAME statement resumes the
    * SAME lineage — the scheduled-job shape, exactly-once across runs
    * (source offsets ride the checkpoint; the sink's txn watermark makes
    * replays no-ops).
    */
  val StreamCheckpointConf = "spark.graft.sql.streamCheckpoints"

  private def interceptStatement(sqlText: String): Option[LogicalPlan] =
    sqlText match {
      case _ if MergeHead.findPrefixMatchOf(sqlText).isDefined =>
        Some(parseMerge(sqlText))
      case Ctas(ns, t, fmt, select) =>
        // graft tables are parquet + versioned manifests — the layout
        // IcebergExport/DeltaExport can render as either open spec, so
        // iceberg/delta/parquet are render-equivalent and accepted. Any
        // other `USING <format>` (csv, json, …) would silently store
        // different bytes than asked for: refuse loudly, the same policy
        // as unsupported MERGE WHEN shapes (ADVICE r14).
        Option(fmt).map(_.toLowerCase).foreach(f =>
          require(Set("iceberg", "delta", "parquet").contains(f),
            s"CREATE TABLE graft.$ns.$t USING $fmt: graft CTAS stores " +
              "parquet + versioned manifests (adoptable as iceberg or " +
              "delta); USING iceberg|delta|parquet are the render-" +
              s"equivalent spellings — '$fmt' is not"))
        Some(GraftCtasCommand(ns, t, select))
      case UpdateHead(ns, t, rest) =>
        // top-level WHERE split (string literals and parens are opaque)
        val i = topLevelIndexOf(rest, "WHERE")
        val (set, where) =
          if (i < 0) (rest, None)
          else (rest.take(i).trim, Some(rest.drop(i + 5).trim))
        Some(GraftUpdateCommand(ns, t, set, where))
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

  /** Rewrite the one NON-SPARK piece of read grammar — the `STREAM`
    * prefix (Databricks idiom; Spark has no spelling for "this relation
    * is a stream") — into the 4-part name `graft.ns.t.`@stream``, which
    * [[GraftTableCatalog]] refuses (NoSuchTable) so [[GraftRelationRule]]
    * can claim the still-unresolved relation and plan a `graft-lake`
    * readStream. A PURE string transform (VERDICT r14 #2): no session
    * access, no temp views, no side effects — `EXPLAIN` and dry parses
    * mutate nothing.
    *
    * Everything else — plain `graft.ns.t`, `VERSION AS OF n`,
    * `TIMESTAMP AS OF 'ts'` — is left UNTOUCHED: those are standard
    * grammar the delegate parses natively, resolved by the registered
    * `graft` catalog's loadTable (time-travel overloads included).
    */
  private def rewriteReads(sqlText: String): String = {
    if (!TableRef.findFirstIn(sqlText).isDefined) return sqlText
    // string literals and backticked identifiers are opaque: `SELECT
    // 'see FROM STREAM graft.x.y' …` must pass through byte-identical
    // (the keyword anchor alone protects bare identifiers, not quoted
    // spans — VERDICT r13/ADVICE r14). A match is rewritten only when it
    // STARTS outside every quoted span.
    val spans = literalSpans(sqlText)
    def inLiteral(pos: Int): Boolean =
      spans.exists(sp => pos >= sp._1 && pos < sp._2)
    TableRef.replaceAllIn(sqlText, m =>
      if (inLiteral(m.start) || m.group(3) == null)
        scala.util.matching.Regex.quoteReplacement(m.matched)
      else {
        val (ns, t) = (m.group(4), m.group(5))
        // offsets/time travel make no sense on a continuous read
        require(m.group(7) == null && m.group(8) == null,
          s"STREAM graft.$ns.$t cannot combine with VERSION/TIMESTAMP AS " +
            "OF — a stream's position is its checkpoint, not a snapshot pin")
        m.group(1) + m.group(2) + s"graft.$ns.$t.`@stream`"
      })
  }

  /** Spans [start, endExcl) of single-/double-quoted string literals AND
    * backtick-quoted identifiers (ADVICE r14: an identifier whose text
    * contains `FROM graft.x.y` must survive the read rewrite too); a
    * backslash escapes the next char inside a literal, and a doubled
    * quote reads as close-then-reopen (net effect: still masked).
    */
  private def literalSpans(s: String): Seq[(Int, Int)] = {
    val out = Seq.newBuilder[(Int, Int)]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\'' || c == '"' || c == '`') {
        val start = i
        var j = i + 1
        while (j < n && s.charAt(j) != c) {
          if (s.charAt(j) == '\\' && j + 1 < n) j += 1
          j += 1
        }
        val end = math.min(n, j + 1)
        out += ((start, end))
        i = end
      } else i += 1
    }
    out.result()
  }

  /** Full MERGE grammar — covers the reference's LITERAL emitted statement
    * (merge_utils.py:74-80) as well as the bare form:
    *
    * {{{
    * MERGE INTO graft.<ns>.<t> [AS] [tAlias]
    * USING ( <subquery> ) | <viewOrTable> [AS] [sAlias]
    * [ON <cond>]        -- bare key, or `a.`k` = b.`k`` [AND …] (multi-col)
    * [WHEN MATCHED THEN UPDATE SET *
    *  WHEN NOT MATCHED THEN INSERT *]
    * }}}
    *
    * The WHEN clauses are accepted ONLY in the `UPDATE SET * / INSERT *`
    * form — exactly the semantics [[graft.lake.TableMerger]] executes
    * (and the only form the reference emits). Any other WHEN shape is
    * refused loudly: silently running different merge semantics than the
    * statement asks for would be worse than an unsupported-grammar error.
    * Qualified ON conjuncts must equate the SAME column on both sides
    * (`t.`id` = s.`id``) — graft merges are key-equality upserts, not
    * general theta merges.
    */
  private def parseMerge(sqlText: String): GraftMergeCommand = {
    val m = MergeHead.findPrefixMatchOf(sqlText).get
    val (ns, t) = (m.group(1), m.group(2))
    val rest0 = sqlText.substring(m.end).trim.stripSuffix(";").trim
    val usingIdx = topLevelIndexOf(rest0, "USING")
    require(usingIdx >= 0, s"MERGE INTO graft.$ns.$t needs a USING clause")
    // anything between the target and USING is the (ignored) target alias
    val tgtAlias = rest0.take(usingIdx).trim
    require(tgtAlias.isEmpty || tgtAlias.matches("""(?i)(AS\s+)?[`\w]+"""),
      s"bad MERGE target alias: '$tgtAlias'")
    var rest = rest0.drop(usingIdx + "USING".length).trim
    // source: a parenthesized subquery, `STREAM graft.ns.t` (r16 — the
    // continuous MERGE: the statement becomes a keyed streaming pipeline,
    // see GraftMergeCommand), or a view/table name
    val source: Either[String, String] =
      if (rest.startsWith("(")) {
        val close = matchParen(rest, 0)
        val sub = rest.substring(1, close).trim
        rest = rest.drop(close + 1)
        Left(sub)
      } else StreamTable.findPrefixMatchOf(rest) match {
        case Some(sm) =>
          rest = rest.drop(sm.end)
          // normalize the named-stream form into the subquery form: the
          // inner statement re-enters the session parser, whose read
          // rewrite plans the `graft-lake` readStream — one code path for
          // both spellings, and the subquery form may carry transforms
          Left(s"SELECT * FROM STREAM graft.${sm.group(1)}.${sm.group(2)}")
        case None =>
          val idm = """^[\w.`]+""".r.findFirstIn(rest).getOrElse(
            sys.error(s"MERGE USING needs a source table/view, (subquery), " +
              s"or STREAM graft.<ns>.<t>, got: $rest"))
          rest = rest.drop(idm.length)
          Right(idm.replace("`", ""))
      }
    // optional source alias (consumed and ignored — the merge's column
    // semantics are SET */INSERT *, so aliases only matter for ON, where
    // qualifiers are validated then stripped)
    val onIdx = topLevelIndexOf(rest, "ON")
    val whenIdx = topLevelIndexOf(rest, "WHEN")
    val aliasEnd = Seq(onIdx, whenIdx, rest.length).filter(_ >= 0).min
    val srcAlias = rest.take(aliasEnd).trim
    require(srcAlias.isEmpty || srcAlias.matches("""(?i)(AS\s+)?[`\w]+"""),
      s"bad MERGE source alias: '$srcAlias'")
    // ON: bare key, or AND-conjoined [alias.]`col` = [alias.]`col` pairs
    val keys: Seq[String] =
      if (onIdx < 0) Seq.empty
      else {
        val condEnd = if (whenIdx > onIdx) whenIdx else rest.length
        val cond = rest.substring(onIdx + 2, condEnd).trim
        splitTopKeyword(cond, "AND").map { conjunct =>
          val eq = topLevelIndexOf(conjunct, "=", wordBounded = false)
          if (eq < 0) {
            val k = unquoteCol(conjunct)
            require(k.matches("""\w+"""), s"bad MERGE ON term: '$conjunct'")
            k
          } else {
            val l = unquoteCol(conjunct.take(eq))
            val r = unquoteCol(conjunct.drop(eq + 1))
            require(l == r,
              s"MERGE ON must equate the same key column on both sides " +
                s"(t.`k` = s.`k`); got '$conjunct'")
            l
          }
        }
      }
    // WHEN clauses: only the reference's SET */INSERT * pair
    if (whenIdx >= 0) {
      val whenPart = rest.drop(whenIdx)
      require(WhenClauses.pattern.matcher(whenPart).matches(),
        "unsupported MERGE WHEN clauses — graft MERGE runs the " +
          "`WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *` " +
          s"semantics (the reference's own shape); got: $whenPart")
    }
    GraftMergeCommand(ns, t, source, keys)
  }

  private val WhenClauses =
    """(?is)\s*WHEN\s+MATCHED\s+THEN\s+UPDATE\s+SET\s+\*\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s+\*\s*;?\s*""".r

  private val StreamTable = """(?is)STREAM\s+graft\.(\w+)\.(\w+)""".r

  /** `col`, `alias.col`, backticked either way → the bare column name. */
  private def unquoteCol(s: String): String = {
    val bare = s.trim.replace("`", "")
    val dot = bare.lastIndexOf('.')
    if (dot >= 0) bare.drop(dot + 1) else bare
  }

  /** Index just past the matching close paren for the open at `open`. */
  private def matchParen(s: String, open: Int): Int = {
    require(s.charAt(open) == '(')
    var depth = 0; var quote: Char = 0; var i = open
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else c match {
        case '\'' | '"' | '`' => quote = c
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    sys.error(s"unbalanced parens in: $s")
  }

  private def isIdentChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  /** First TOP-LEVEL occurrence of `word` — case-insensitive, outside
    * quotes (single, double, backtick) and parens, word-boundary-checked
    * unless `wordBounded=false` — or -1. The quote-aware sibling of
    * [[splitTop]]: every keyword split in the façade goes through here so
    * string literals containing SQL keywords can never derail the grammar
    * (ADVICE r13).
    */
  private[sql] def topLevelIndexOf(
      s: String, word: String, wordBounded: Boolean = true): Int = {
    var i = 0; var depth = 0; var quote: Char = 0
    val n = s.length; val w = word.length
    while (i < n) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0; i += 1 }
      else c match {
        case '\'' | '"' | '`' => quote = c; i += 1
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case _ =>
          if (depth == 0 && s.regionMatches(true, i, word, 0, w) &&
              (!wordBounded ||
                ((i == 0 || !isIdentChar(s.charAt(i - 1))) &&
                 (i + w >= n || !isIdentChar(s.charAt(i + w))))))
            return i
          i += 1
      }
    }
    -1
  }

  /** Split on TOP-LEVEL occurrences of a keyword (AND, …) — quote/paren
    * aware like [[splitTop]].
    */
  private[sql] def splitTopKeyword(s: String, word: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var rest = s
    var i = topLevelIndexOf(rest, word)
    while (i >= 0) {
      out += rest.take(i).trim
      rest = rest.drop(i + word.length)
      i = topLevelIndexOf(rest, word)
    }
    out += rest.trim
    out.result().filter(_.nonEmpty)
  }

  /** Split on TOP-LEVEL commas only (parens and quoted spans — single,
    * double, backtick, the same three kinds [[topLevelIndexOf]] masks —
    * are opaque), so `SET a = greatest(b, c), d = 'x,y', e = "p,q"`
    * parses as three assignments (ADVICE r14 closed the double-quote
    * hole).
    */
  private[sql] def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    s.foreach { c =>
      if (quote != 0) { if (c == quote) quote = 0; cur += c }
      else c match {
        case '\'' | '"' | '`' => quote = c; cur += c
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

  /** Whitespace-collapsed spelling of a statement fragment — the identity
    * the checkpoint guard compares. Case and literals are preserved:
    * over-normalizing (e.g. lowercasing) would let two statements with
    * different string-literal predicates share a lineage.
    */
  private[sql] def normalizeStmt(s: String): String =
    s.replaceAll("\\s+", " ").trim

  /** One-statement streaming checkpoints are keyed by DESTINATION
    * (`<cpRoot>/<ns>.<table>`), so re-running the same statement resumes
    * its lineage — but a DIFFERENT statement aimed at the same
    * destination (another source table, another projection, INSERT vs
    * MERGE) would silently resume the OLD statement's offsets against the
    * NEW source and skip data (ADVICE r15). The guard persists the
    * statement's normalized identity under the checkpoint on first run
    * and REFUSES loudly on mismatch ever after. A pre-existing lineage
    * without the marker (pre-r16) is adopted by the first statement that
    * touches it.
    */
  private[sql] def guardStatementIdentity(
      spark: SparkSession, checkpoint: String, identity: String): Unit = {
    val id = normalizeStmt(identity)
    val dir = new org.apache.hadoop.fs.Path(checkpoint)
    val f = new org.apache.hadoop.fs.Path(dir, "graft-stmt")
    val fs = f.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(f)) {
      val in = fs.open(f)
      val existing =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      require(existing == id,
        s"streaming checkpoint $checkpoint belongs to a DIFFERENT " +
          s"statement:\n  existing: $existing\n  this run: $id\n" +
          "Re-running a changed statement against the old lineage would " +
          "apply stale offsets to the new source and skip data — point " +
          s"the new statement at a fresh destination/checkpoint root " +
          s"(${StreamCheckpointConf}), or delete the checkpoint to restart " +
          "the lineage from scratch.")
    } else {
      fs.mkdirs(dir)
      val out = fs.create(f, true)
      try out.write(id.getBytes("UTF-8")) finally out.close()
    }
  }

  /** Drain a streaming frame into `graft.ns.table` through the native
    * E25 sink under `Trigger.AvailableNow` — the shared landing body of
    * the one-statement streaming pipelines (INSERT … FROM STREAM appends;
    * MERGE … USING STREAM upserts/CDC-applies). Returns the destination's
    * final version.
    */
  private[sql] def runStreamingLand(
      spark: SparkSession, ns: String, table: String, df:
      org.apache.spark.sql.DataFrame, identity: String,
      sinkOptions: Map[String, String], outputMode: String): Long = {
    val cat = catalogOf(spark)
    val cpRoot = spark.conf.getOption(StreamCheckpointConf).getOrElse(
      sys.error(s"set $StreamCheckpointConf to a durable checkpoint " +
        "root before one-statement streaming SQL (re-running the " +
        "statement resumes its lineage from there)"))
    val root = spark.conf.getOption(RootConf).getOrElse(sys.error(
      s"set $RootConf to the lake root before using graft.<ns>.<table> SQL"))
    val cp = s"${cpRoot.stripSuffix("/")}/$ns.$table"
    guardStatementIdentity(spark, cp, identity)
    val q = df.writeStream.format("graft-lake")
      .option("root", root).option("table", s"$ns.$table")
      .option("checkpointLocation", cp)
      .options(sinkOptions)
      .outputMode(outputMode)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try q.awaitTermination() finally { if (q.isActive) q.stop() }
    cat.versions(ns, table).lastOption.getOrElse(0).toLong
  }

  /** `MERGE INTO graft.ns.t [alias] USING <src|(subquery)> [alias]
    * [ON cond] [WHEN …]` — the reference's SQL-first merge surface over
    * [[graft.lake.TableMerger]] (strategy auto-selection and key
    * auto-detection included; multi-column ON runs the composite-key
    * upsert). The subquery form re-enters the session parser, so it may
    * itself read `graft.<ns>.<t>` tables. Returns (table, new version).
    *
    * CONTINUOUS MERGE (r16, VERDICT r15 #1): when the source is a stream
    * (`USING STREAM graft.ns.src`, or a subquery reading `FROM STREAM …`
    * — a streaming AGGREGATE included), the whole statement becomes a
    * KEYED streaming pipeline: source → transform → the native E25 sink
    * in `upsert` mode (or `cdc` when the stream carries an `_op` column —
    * the Debezium feed lands tombstones too), Update output so re-emitted
    * aggregate groups CONVERGE on their key, drained under
    * `Trigger.AvailableNow` with the same per-destination checkpoint +
    * statement-identity guard as the INSERT pipeline. Re-running the
    * statement resumes the lineage and processes only what's new — the
    * reference's MERGE shape (merge_utils.py:74-80) applied continuously,
    * exactly-once end to end.
    */
  case class GraftMergeCommand(ns: String, table: String,
      source: Either[String, String], keys: Seq[String])
      extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val merger = new graft.lake.TableMerger(cat)
      val src = source match {
        case Left(subquery) => spark.sql(subquery)
        case Right(name) => spark.table(name)
      }
      val v: Long =
        if (src.isStreaming) {
          val cdc = src.columns.contains("_op")
          val ks =
            if (keys.nonEmpty) keys
            else merger.findKeyColumn(if (cdc) src.drop("_op") else src).toSeq
          require(ks.nonEmpty,
            s"MERGE INTO graft.$ns.$table USING STREAM: no ON clause and " +
              s"no key candidate among ${merger.keyCandidates.mkString(",")} " +
              "in the stream's columns — a continuous merge needs its key")
          val srcText = source.fold(identity, identity)
          runStreamingLand(spark, ns, table, src,
            identity = s"merge into graft.$ns.$table using ($srcText) " +
              s"on ${ks.mkString(",")}",
            sinkOptions = Map(
              "mode" -> (if (cdc) "cdc" else "upsert"),
              "key" -> ks.mkString(",")),
            outputMode = "update")
        } else {
          if (keys.size > 1) merger.mergeTableKeys(src, ns, table, keys)
          else merger.mergeTable(src, ns, table, keys.headOption)
          cat.versions(ns, table).last.toLong
        }
      Seq(Row(s"$ns.$table", v))
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
    *
    * ONE-STATEMENT STREAMING PIPELINE (VERDICT r14 #1): when the inner
    * select reads `FROM STREAM graft.ns.src`, the whole statement plans
    * source→transform→sink as a `graft-lake`-sink streaming query run
    * under `Trigger.AvailableNow` — drain everything available in
    * rate-limited micro-batches, then return. The checkpoint lives at
    * `<[[StreamCheckpointConf]]>/<ns>.<table>`, so RE-RUNNING the same
    * statement resumes the same lineage and processes only what's new:
    * the scheduled-incremental-job shape, exactly-once end to end
    * (snapshot-version offsets in, txn-watermarked commits out). The
    * lineage is guarded by [[guardStatementIdentity]] (r16): a DIFFERENT
    * statement aimed at the same destination refuses instead of resuming
    * the old statement's offsets against the new source.
    */
  case class GraftInsertCommand(ns: String, table: String, select: String,
      overwrite: Boolean = false) extends LeafRunnableCommand {
    override def output: Seq[Attribute] = outCols
    override def run(spark: SparkSession): Seq[Row] = {
      val cat = catalogOf(spark)
      val df = spark.sql(select)
      val v: Long =
        if (df.isStreaming) {
          require(!overwrite,
            "INSERT OVERWRITE cannot take a STREAM source — a stream lands " +
              "incremental appends; use a batch INSERT OVERWRITE, or a " +
              "foreachBatch sink for per-batch overwrite semantics")
          runStreamingLand(spark, ns, table, df,
            identity = s"insert into graft.$ns.$table ($select)",
            sinkOptions = Map.empty, outputMode = "append")
        } else cat.write(ns, table, df,
          if (overwrite) org.apache.spark.sql.SaveMode.Overwrite
          else org.apache.spark.sql.SaveMode.Append).toLong
      Seq(Row(s"$ns.$table", v))
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
