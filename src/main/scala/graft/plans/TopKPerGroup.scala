package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Logical "keep the top-k rows of each group under `order`" operator.
  *
  * Spark expresses this as window row_number + filter, which sorts EVERY
  * row of every group (full shuffle + per-partition sort, spilling at
  * scale). This operator instead reduces each partition to at most k rows
  * per group with a bounded heap BEFORE the shuffle (the aggregation-style
  * partial/final split applied to top-k), so the exchange moves at most
  * k * groups * partitions rows and nothing is ever globally sorted —
  * the right shape for "top N documents per domain" style selections over
  * 100 TB.
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** shared per-partition bounded top-k reduction */
private[plans] object TopKReduce {
  def reduce(
      iter: Iterator[InternalRow],
      output: Seq[Attribute],
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int): Iterator[InternalRow] = {
    val keyProj = UnsafeProjection.create(groupExprs, output)
    val rowOrd = org.apache.spark.sql.catalyst.expressions.RowOrdering.create(
      order, output.toIndexedSeq)
    // per group: heap whose head is the WORST kept row (reverse ordering)
    val heaps = new java.util.LinkedHashMap[UnsafeRow,
      scala.collection.mutable.PriorityQueue[InternalRow]]()
    while (iter.hasNext) {
      val row = iter.next()
      val key = keyProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = scala.collection.mutable.PriorityQueue.empty[InternalRow](
          (a: InternalRow, b: InternalRow) => rowOrd.compare(a, b))
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) {
        heap.enqueue(row.copy())
      } else if (rowOrd.compare(row, heap.head) < 0) {
        heap.dequeue()
        heap.enqueue(row.copy())
      }
    }
    import scala.jdk.CollectionConverters._
    heaps.values().iterator().asScala.flatMap(_.iterator)
  }
}

case class PartialTopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] = Seq(UnspecifiedDistribution)
  // narrow per-partition reduction: rows never move
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    // locals only: the closure must not capture the plan node itself
    val (out, g, o, kk) = (output, groupExprs, order, k)
    child.execute().mapPartitions(it => TopKReduce.reduce(it, out, g, o, kk))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): PartialTopKPerGroupExec =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // final pass needs each group wholly in one partition
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(groupExprs))
  // groups stay where the exchange put them, so downstream operators
  // clustered on the same keys (a groupBy after a per-group cap is the
  // common shape) reuse this exchange instead of shuffling ≤k-per-group
  // rows again
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] = {
    val (out, g, o, kk) = (output, groupExprs, order, k)
    child.execute().mapPartitions(it => TopKReduce.reduce(it, out, g, o, kk))
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** planner strategy: logical TopKPerGroup → partial reduce (pre-shuffle)
  * + clustered final reduce; Spark inserts the exchange between them to
  * satisfy the final node's required distribution.
  */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, PartialTopKPerGroupExec(g, o, k, planLater(child))) :: Nil
    case _ => Nil
  }
}
