package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, SpecifiedWindowFrame, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrites the idiomatic top-k-per-group pattern
  *
  * {{{ Project(cols, Filter(rn <= k, Window(row_number as rn over (...)))) }}}
  *
  * into the custom [[TopKPerGroup]] operator (bounded-heap partial
  * reduction instead of a full per-group sort). Conservative by design:
  * only fires when the window computes exactly one row_number, the filter
  * is a literal bound on it, and the projection drops the rank column —
  * any other use of `rn` keeps the original plan. Opt-in via
  * `spark.graft.topkRewrite=true` so plans stay predictable by default.
  */
case class TopKRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!spark.conf.get("spark.graft.topkRewrite", "false").equalsIgnoreCase("true")) {
      return plan
    }
    plan.transformUp {
      case p @ Project(projectList,
            Filter(cond, w @ Window(Seq(rnAlias @ Alias(
              WindowExpression(RowNumber(),
                WindowSpecDefinition(parts, order, _: SpecifiedWindowFrame)), _)), _, _, child, _)))
          if parts.nonEmpty && // global top-k (no PARTITION BY) stays a Window
            bound(cond, rnAlias.toAttribute).exists(_ >= 1) &&
            projectList.forall(_.references.subsetOf(child.outputSet)) =>
        val k = bound(cond, rnAlias.toAttribute).get
        Project(projectList, TopKPerGroup(parts, order, k, child))
    }
  }

  /** extract k from `rn <= k` / `rn < k+1` when rn is the given attribute */
  private def bound(cond: org.apache.spark.sql.catalyst.expressions.Expression,
      rn: Attribute): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k)
    case LessThan(a: Attribute, IntegerLiteral(k)) if a.semanticEquals(rn) => Some(k - 1)
    case _ => None
  }
}
