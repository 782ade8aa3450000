package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded min-k aggregate over a BIGINT column: returns the k smallest
  * values, sorted ascending — semantically identical to
  * `slice(array_sort(collect_list(x)), 1, k)` but with an aggregation
  * buffer that NEVER holds more than k elements.
  *
  * This is the skew guard the LSH bucket stage needs at corpus scale:
  * `collect_list` materializes the ENTIRE group in the buffer before any
  * cap applies, so one degenerate bucket (billions of identical spam
  * documents hashing to the same (band, bucket) key at 100 TB) blows a
  * single reducer. Here each partial buffer tops out at k longs (a max-heap
  * evicts the largest on overflow), partial merge stays k-bounded, and —
  * because TypedImperativeAggregate supports partial aggregation — the
  * map side combines BEFORE the shuffle, so the degenerate key never even
  * concentrates more than k * numMapTasks values on one reducer.
  */
case class BoundedMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Long]]
  with UnaryLike[Expression] {

  require(k > 0, s"graft_min_k: k must be positive, got $k")

  override def createAggregationBuffer(): mutable.PriorityQueue[Long] =
    mutable.PriorityQueue.empty[Long] // natural ordering = max-heap: peek is the largest kept

  private def add(buf: mutable.PriorityQueue[Long], v: Long): Unit =
    if (buf.size < k) { buf.enqueue(v) }
    else if (v < buf.head) { buf.dequeue(); buf.enqueue(v) }

  override def update(
      buf: mutable.PriorityQueue[Long], input: InternalRow): mutable.PriorityQueue[Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[Long],
      other: mutable.PriorityQueue[Long]): mutable.PriorityQueue[Long] = {
    other.foreach(add(buf, _))
    buf
  }

  override def eval(buf: mutable.PriorityQueue[Long]): Any =
    new GenericArrayData(buf.toArray.sorted)

  override def serialize(buf: mutable.PriorityQueue[Long]): Array[Byte] = {
    val arr = buf.toArray
    val bb = ByteBuffer.allocate(4 + 8 * arr.length)
    bb.putInt(arr.length)
    arr.foreach { v => bb.putLong(v); () }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val q = mutable.PriorityQueue.empty[Long]
    var i = 0
    while (i < n) { q.enqueue(bb.getLong); i += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(o: Int): BoundedMinK =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedMinK =
    copy(inputAggBufferOffset = o)

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_min_k requires a BIGINT column, got ${child.dataType.catalogString}")

  override protected def withNewChildInternal(c: Expression): BoundedMinK = copy(child = c)
  override def prettyName: String = "graft_min_k"
}
