package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType}

/** Native Catalyst AGGREGATE (the engine's UDAF-tier extension, next to
  * the scalar-expression tier): per-group top-k largest values of any
  * orderable input — including structs, whose lexicographic field order
  * doubles as the (sort key, tie-break, payload) tuple.
  *
  * Why an aggregate and not a window: `row_number() OVER (PARTITION BY g
  * ORDER BY v)` shuffles EVERY row to its group's partition and sorts the
  * whole group, then discards all but k rows. This aggregate is
  * partial-aggregation friendly: each map task keeps at most k values per
  * group, the exchange carries ≤ k·partitions rows per group, and no sort
  * ever sees more than the k survivors (plans as ObjectHashAggregate —
  * PlanSpec pins the no-Window shape for q66). At 100 TB top-k-per-group
  * is the difference between shuffling the corpus and shuffling k rows
  * per group per mapper.
  *
  * Buffer: a bounded ascending-sorted ArrayBuffer (k is small — the
  * binary-search insert is O(log k) compare + O(k) move, cheaper than a
  * heap's constant factors at these sizes). Nulls are skipped (SQL
  * aggregate convention). Serialization between partial and final
  * aggregation round-trips each value through a 1-field UnsafeRow.
  */
case class TopKLargest(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArrayBuffer[Any]] with UnaryLike[Expression] {

  @transient private lazy val ordering = TypeUtils.getInterpretedOrdering(child.dataType)

  // One projection per task, NOT per serialize() call: create() re-generates
  // the projection code string every time (only the janino compile is
  // cached), and serialize runs once per (group, mapper) — at sf1 that is
  // ~1.5M calls, which dominated the whole aggregate before hoisting
  // (SCALING.md, q66). Expressions are deserialized per-task, so the lazy
  // val is single-threaded.
  @transient private lazy val serProj = UnsafeProjection.create(Array(child.dataType))

  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else if (!org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an orderable type, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(child.dataType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): ArrayBuffer[Any] = ArrayBuffer.empty

  /** Insert keeping `buf` ascending and |buf| ≤ k; smallest is buf(0).
    * `copyOnInsert` defers the defensive copy until a value actually
    * enters the buffer — once the buffer is full, the common case is a
    * floor-comparison and early return, and copying every scanned row
    * first would allocate k-irrelevant copies for the whole input.
    */
  private def insert(buf: ArrayBuffer[Any], v: Any, copyOnInsert: Boolean): Unit = {
    if (buf.size == k) {
      if (ordering.compare(v, buf(0)) <= 0) return // below the floor
      buf.remove(0)
    }
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (ordering.compare(buf(mid), v) < 0) lo = mid + 1 else hi = mid
    }
    buf.insert(lo, if (copyOnInsert) InternalRow.copyValue(v) else v)
  }

  override def update(buf: ArrayBuffer[Any], input: InternalRow): ArrayBuffer[Any] = {
    val v = child.eval(input)
    // copy on insert: eval may return a row/buffer reused by the scan
    if (v != null) insert(buf, v, copyOnInsert = true)
    buf
  }

  override def merge(buf: ArrayBuffer[Any], other: ArrayBuffer[Any]): ArrayBuffer[Any] = {
    // deserialized/partial values are already owned — no copy needed
    other.foreach(insert(buf, _, copyOnInsert = false))
    buf
  }

  /** Largest first — callers explode to (rank, value) with posexplode. */
  override def eval(buf: ArrayBuffer[Any]): Any =
    new GenericArrayData(buf.reverseIterator.toArray)

  override def serialize(buf: ArrayBuffer[Any]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    val holder = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    buf.foreach { v =>
      holder.update(0, v)
      val bytes = serProj(holder).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[Any] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      val row = new UnsafeRow(1)
      row.pointTo(arr, len)
      buf += row.get(0, child.dataType) // backed by this row's fresh bytes
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKLargest =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKLargest =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKLargest =
    copy(child = newChild)
}
