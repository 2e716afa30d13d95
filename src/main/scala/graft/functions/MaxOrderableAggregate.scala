package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types.DataType

/** Native Catalyst MAX over ANY orderable type — the k = 1 argmax twin
  * of [[TopKLargest]], built for struct winners.
  *
  * Why it exists: Spark's declarative `Max` needs a MUTABLE aggregation
  * buffer to hash-aggregate, and struct values are immutable buffer
  * types, so `max(struct(ts, seq, op, payload))` — the CDC-compaction
  * winner shape (q168, `etl/Cdc.scala`) — silently falls back to
  * SortAggregate: every input partition SORTS on the group key before
  * the partial aggregate, and again after the exchange. The sorts are
  * pure overhead (max is order-insensitive) and degrade worst exactly
  * when it matters — under memory pressure they spill. This
  * TypedImperativeAggregate keeps one winner per (group, mapper) in an
  * object buffer, so the plan becomes ObjectHashAggregate with the same
  * partial/final split and NO sorts (PlanSpec pins the q168 shape).
  *
  * Semantics match SQL `max` exactly: nulls skipped, empty group →
  * null, ordering = the type's interpreted total order (for structs,
  * lexicographic field order — the (sort key, tie-break, payload)
  * convention callers already rely on).
  *
  * Buffer: a 1-slot Array[Any] (null = empty). Serialization
  * round-trips the winner through a 1-field UnsafeRow exactly like
  * [[TopKLargest]] (one hoisted projection per task — see the
  * SCALING.md note there).
  */
case class MaxOrderable(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Any]] with UnaryLike[Expression] {

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)

  @transient private lazy val serProj = UnsafeProjection.create(Array(child.dataType))

  override def checkInputDataTypes(): TypeCheckResult =
    if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an orderable type, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_max_orderable"

  override def createAggregationBuffer(): Array[Any] = Array[Any](null)

  override def update(buf: Array[Any], input: InternalRow): Array[Any] = {
    val v = child.eval(input)
    if (v != null && (buf(0) == null || ordering.compare(v, buf(0)) > 0))
      // copy: eval may return a row/buffer the scan reuses
      buf(0) = InternalRow.copyValue(v)
    buf
  }

  override def merge(buf: Array[Any], other: Array[Any]): Array[Any] = {
    val v = other(0)
    // deserialized/partial winners are already owned — no copy needed
    if (v != null && (buf(0) == null || ordering.compare(v, buf(0)) > 0))
      buf(0) = v
    buf
  }

  override def eval(buf: Array[Any]): Any = buf(0)

  override def serialize(buf: Array[Any]): Array[Byte] =
    if (buf(0) == null) Array.emptyByteArray
    else {
      val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      holder.update(0, buf(0))
      serProj(holder).getBytes
    }

  override def deserialize(bytes: Array[Byte]): Array[Any] =
    if (bytes.isEmpty) Array[Any](null)
    else {
      val row = new UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      Array[Any](row.get(0, child.dataType)) // backed by this row's fresh bytes
    }

  override def withNewMutableAggBufferOffset(newOffset: Int): MaxOrderable =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MaxOrderable =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MaxOrderable =
    copy(child = newChild)
}
