package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

/** Plan-quality regression guards: these pin the physical-plan properties
  * the 100 TB design depends on (SURVEY §4), so a refactor that silently
  * breaks pushdown or broadcasting fails CI, not the cluster.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(q: Q): String =
    q.fn(spark, sfDir).queryExecution.executedPlan.toString

  test("q1: shipdate filter is pushed into the parquet scan") {
    val p = plan(Relational.q1PricingSummary)
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1: aggregation is partial before the exchange") {
    val p = plan(Relational.q1PricingSummary)
    assert(p.contains("partial_sum"), p)
  }

  test("q5: dimension joins broadcast (fact table never shuffled for joins)") {
    val p = plan(Relational.q5LocalSupplier)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).length
    assert(broadcasts >= 4, s"expected >=4 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q_topk_parts: part dimension is broadcast") {
    val p = plan(Relational.qTopKParts)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("scans prune columns: q1 reads only the needed lineitem columns") {
    val p = plan(Relational.q1PricingSummary)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_comment"),
      readSchema)
  }

  test("semi/anti joins plan as join types, not materialized subqueries") {
    assert(plan(Relational.qSemiJoin).contains("LeftSemi"))
    assert(plan(Relational.qAntiJoin).contains("LeftAnti"))
  }
}
