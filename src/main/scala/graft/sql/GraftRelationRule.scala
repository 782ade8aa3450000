package graft.sql

import org.apache.spark.sql.{GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Alias, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** SIDE-EFFECT-FREE resolution of `graft.<ns>.<table>` references (VERDICT
  * r14 #2): [[GraftTableCatalog]] resolves the NAME (returning a
  * [[GraftTable]] marker with the schema and time-travel spec); this
  * analyzer rule swaps the marker's relation for the REAL catalog-read
  * plan — the multi-commit parquet relations, deletion-vector anti-joins,
  * schema-evolution casts the DataFrame API builds. Replaces the pre-r15
  * approach of materializing temp views at PARSE time. Consequences, each
  * pinned in SqlFacadeSpec:
  *
  *   - `EXPLAIN`, a dry `parsePlan`, and plan pretty-printing mutate
  *     NOTHING — no temp views appear in the session catalog;
  *   - concurrent sessions can never collide on rewrite view names
  *     (there are none);
  *   - each reference of a self-join gets fresh attribute ids, so the
  *     analyzer's disambiguation works as on any other relation.
  *
  * The swap happens mid-resolution, so column references that already
  * resolved against the marker's output must KEEP their expression ids: a
  * top-level Project re-aliases the real plan's columns onto the marker's
  * exprIds/qualifiers (name-matched — the read plan's schema IS the
  * marker's schema).
  *
  * The `FROM STREAM graft.ns.t` idiom still needs one extra step (no
  * standard grammar exists): the façade rewrites it — pure string
  * transform — to the 4-part name `graft.ns.t.`@stream``, which the
  * catalog refuses (NoSuchTable), leaving an [[UnresolvedRelation]] this
  * rule resolves into a `graft-lake` readStream relation. Source options
  * come from session confs under [[GraftSqlParser.StreamOptionPrefix]].
  *
  * Scale note: resolution is manifest-metadata-only (the catalog read
  * PLANS relations over the snapshot's commit dirs; no data IO until the
  * query executes), so analyzing a 100 TB table's reference costs KBs of
  * manifest reads, same as the DataFrame API.
  */
case class GraftRelationRule(spark: SparkSession) extends Rule[LogicalPlan] {

  import GraftSqlParser.{RootConf, StreamOptionPrefix}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case r: DataSourceV2Relation if r.table.isInstanceOf[GraftTable] =>
      substitute(r, r.table.asInstanceOf[GraftTable])
    case u: UnresolvedRelation if isStreamRef(u.multipartIdentifier) =>
      resolveStream(u.multipartIdentifier)
  }

  /** Marker relation → real read plan, preserving the marker's output
    * exprIds (references above may have resolved already).
    */
  private def substitute(r: DataSourceV2Relation, t: GraftTable): LogicalPlan = {
    val real = GraftBridge.analyzed(t.read())
    val byName = real.output.map(a => (a.name, a)).toMap
    val cols: Seq[NamedExpression] = r.output.map { old =>
      val nw = byName.getOrElse(old.name, sys.error(
        s"graft.${t.ns}.${t.table}: resolved plan lost column '${old.name}' " +
          s"(have ${real.output.map(_.name).mkString(",")})"))
      Alias(nw, old.name)(exprId = old.exprId, qualifier = old.qualifier)
    }
    Project(cols, SubqueryAlias(t.table, real))
  }

  private def isStreamRef(parts: Seq[String]): Boolean =
    parts.length == 4 && parts.head.equalsIgnoreCase("graft") &&
      parts(3) == "@stream"

  private def resolveStream(parts: Seq[String]): LogicalPlan = {
    val (ns, t) = (parts(1), parts(2))
    val root = spark.conf.getOption(RootConf).getOrElse(sys.error(
      s"set $RootConf to the lake root before using graft.<ns>.<table> SQL"))
    val opts = spark.conf.getAll
      .collect { case (k, v) if k.startsWith(StreamOptionPrefix) =>
        k.stripPrefix(StreamOptionPrefix) -> v }
    val df = spark.readStream.format("graft-lake")
      .option("root", root).option("table", s"$ns.$t")
      .options(opts).load()
    SubqueryAlias(t, GraftBridge.analyzed(df))
  }
}
