package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `mg_topk(key, m)` — a Misra–Gries heavy-hitter sketch as a NATIVE
  * Catalyst [[TypedImperativeAggregate]]: the engine-level counterpart
  * of q132's per-partition `mapPartitions` sketch, and strictly more
  * capable — being a real aggregate function it composes with
  * `groupBy` (PER-GROUP heavy-hitter candidates, which the
  * partition-sketch shape cannot express), runs map-side partial
  * aggregation automatically, and ships its state through the shuffle
  * via the same serialize/merge contract Spark's own
  * `percentile_approx`/HLL++ use.
  *
  * Semantics: at most `m` counters. `update` increments a present key
  * or inserts a new one; overflow past `m` triggers a TRIM — subtract
  * the (m+1)-th largest count from every counter and drop the
  * non-positive ones (the classic decrement step, batched). `merge`
  * sums counter maps key-wise and trims the same way — the mergeable-
  * summaries construction (Agarwal et al., PODS'12), which preserves
  * the MG guarantee across any merge tree: every trim of threshold `t`
  * consumes ≥ (m+1)·t of total mass, so the total undercount is
  * ≤ N/(m+1) and ANY key with true frequency > N/(m+1) is present in
  * the final sketch. The sketch therefore PROPOSES a provable superset
  * of the heavy hitters; an exact re-count pass disposes (the q132
  * pattern) — sketch error never reaches an oracle-checked output.
  *
  * `eval` returns the surviving keys sorted (binary order) — estimates
  * are deliberately not exposed, because the propose/verify contract
  * only needs membership, and membership is deterministic while the
  * per-key residual estimates depend on trim order.
  *
  * Scale: the aggregation state is O(m) per group regardless of key
  * cardinality — a 100 TB corpus with a billion-token vocabulary
  * shuffles m-entry sketches instead of the vocabulary.
  *
  * Key types: STRING and BIGINT (cast anything else). Nulls are
  * ignored, like every Spark aggregate.
  */
@ExpressionDescription(
  usage = "_FUNC_(key, m) - Misra-Gries sketch: keys that MAY exceed n/(m+1) frequency (provable superset).")
case class MisraGriesSketch(
    child: Expression,
    capacity: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[Any, Long]] {

  private lazy val m: Int = capacity.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult = {
    if (!capacity.foldable)
      TypeCheckResult.TypeCheckFailure("mg_topk: capacity must be a literal")
    else if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(capacity.dataType))
      TypeCheckResult.TypeCheckFailure("mg_topk: capacity must be integral")
    else if (capacity.eval() == null || capacity.eval().asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure("mg_topk: capacity must be >= 1")
    else child.dataType match {
      case StringType | LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"mg_topk supports STRING and BIGINT keys, got ${other.sql} (cast first)")
    }
  }

  override def createAggregationBuffer(): mutable.HashMap[Any, Long] =
    mutable.HashMap.empty[Any, Long]

  /** Subtract the (m+1)-th largest count from everything, drop ≤ 0 —
    * leaves ≤ m survivors and consumes ≥ (m+1)·t of mass per trim. */
  private def trim(buf: mutable.HashMap[Any, Long]): Unit =
    if (buf.size > m) {
      val counts = buf.values.toArray
      java.util.Arrays.sort(counts)
      val t = counts(counts.length - (m + 1)) // (m+1)-th largest
      buf.mapValuesInPlace((_, v) => v - t)
      buf.filterInPlace((_, v) => v > 0L)
    }

  override def update(buf: mutable.HashMap[Any, Long], input: InternalRow): mutable.HashMap[Any, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // Spark reuses value buffers during evaluation — copy string keys
      val key = v match {
        case s: UTF8String => s.copy()
        case other => other
      }
      buf.updateWith(key) { case Some(c) => Some(c + 1L); case None => Some(1L) }
      trim(buf)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[Any, Long], other: mutable.HashMap[Any, Long]): mutable.HashMap[Any, Long] = {
    other.foreach { case (k, c) =>
      buf.updateWith(k) { case Some(c0) => Some(c0 + c); case None => Some(c) }
    }
    trim(buf)
    buf
  }

  override def eval(buf: mutable.HashMap[Any, Long]): Any = {
    val keys = buf.keys.toArray
    child.dataType match {
      case StringType =>
        java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]],
          (a: AnyRef, b: AnyRef) =>
            a.asInstanceOf[UTF8String].compareTo(b.asInstanceOf[UTF8String]))
      case _ =>
        java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]],
          (a: AnyRef, b: AnyRef) =>
            java.lang.Long.compare(a.asInstanceOf[Long], b.asInstanceOf[Long]))
    }
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.HashMap[Any, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    child.dataType match {
      case StringType =>
        buf.foreach { case (k, c) =>
          val b = k.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b); out.writeLong(c)
        }
      case _ =>
        buf.foreach { case (k, c) =>
          out.writeLong(k.asInstanceOf[Long]); out.writeLong(c)
        }
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[Any, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[Any, Long]
    var i = 0
    child.dataType match {
      case StringType =>
        while (i < n) {
          val len = in.readInt(); val b = new Array[Byte](len); in.readFully(b)
          buf.put(UTF8String.fromBytes(b), in.readLong()); i += 1
        }
      case _ =>
        while (i < n) { buf.put(in.readLong(), in.readLong()); i += 1 }
    }
    buf
  }

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child, capacity)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), capacity = newChildren(1))
  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesSketch =
    copy(inputAggBufferOffset = newOffset)
  override def prettyName: String = "mg_topk"
}
