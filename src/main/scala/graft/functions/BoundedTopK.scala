package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `topk_agg(value, k)` — EXACT grouped top-k as a bounded-heap
  * [[TypedImperativeAggregate]]: returns the k LARGEST values of the
  * group (descending), where `value` is any orderable type — pass a
  * struct to rank by a compound key with a total tiebreak
  * (`struct(score, id)` orders lexicographically).
  *
  * Why an aggregate and not a window: the window spelling
  * (`row_number() OVER (PARTITION BY g ORDER BY v DESC) <= k`) must
  * SHUFFLE AND SORT EVERY ROW of the input — at 100 TB the exchange
  * carries the whole fact table. This aggregate's state is a ≤ k-entry
  * min-heap per group, so partial aggregation prunes map-side: each map
  * task ships at most k rows PER GROUP into the shuffle, the final
  * merge is heap-merge, and nothing global ever sorts. Same exact
  * result (total order ⇒ deterministic top-k), structurally smaller
  * shuffle — the grouped analogue of Spark's own TakeOrderedAndProject.
  *
  * Serialization uses `UnsafeProjection` on a single-column row per
  * element, the same trick `collect_list` plays — so struct/string/
  * numeric payloads all round-trip through the shuffle byte-exactly.
  * Nulls are ignored like every aggregate.
  */
@ExpressionDescription(
  usage = "_FUNC_(value, k) - exact k largest values of the group, descending; value may be a struct for compound ordering.")
case class BoundedTopK(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[Any]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()
  /** Natural ascending ordering of the value type; heap keeps the
    * SMALLEST retained value on top so eviction is O(log k). */
  private lazy val ord: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType).asInstanceOf[Ordering[Any]]

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!kExpr.foldable)
      TypeCheckResult.TypeCheckFailure("topk_agg: k must be a literal")
    else if (kExpr.eval() == null || kExpr.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("topk_agg: k must be >= 1")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"topk_agg: ${child.dataType.sql} is not orderable")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[Any] =
    mutable.PriorityQueue.empty[Any](ord.reverse) // dequeue = smallest

  private def offer(heap: mutable.PriorityQueue[Any], v: Any): Unit =
    if (heap.size < k) heap.enqueue(v)
    else if (ord.gt(v, heap.head)) { heap.dequeue(); heap.enqueue(v) }

  override def update(heap: mutable.PriorityQueue[Any], input: InternalRow): mutable.PriorityQueue[Any] = {
    val v = child.eval(input)
    if (v != null) offer(heap, InternalRow.copyValue(v))
    heap
  }

  override def merge(heap: mutable.PriorityQueue[Any], other: mutable.PriorityQueue[Any]): mutable.PriorityQueue[Any] = {
    other.foreach(offer(heap, _))
    heap
  }

  override def eval(heap: mutable.PriorityQueue[Any]): Any =
    new GenericArrayData(heap.toArray.sorted(ord.reverse))

  // one-column row codec per element — the collect_list serialization trick
  private lazy val proj = UnsafeProjection.create(Array(child.dataType))
  private lazy val holder = new GenericInternalRow(1)

  override def serialize(heap: mutable.PriorityQueue[Any]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    heap.foreach { v =>
      holder.update(0, v)
      val u = proj(holder)
      out.writeInt(u.getSizeInBytes)
      out.write(u.getBytes, 0, u.getSizeInBytes)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[Any] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
      val row = new UnsafeRow(1)
      row.pointTo(b, len)
      heap.enqueue(InternalRow.copyValue(row.get(0, child.dataType)))
      i += 1
    }
    heap
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, kExpr)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedTopK =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "topk_agg"
}
