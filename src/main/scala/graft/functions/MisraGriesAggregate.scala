package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter CANDIDATE summary: a bounded map of at most
  * k−1 (item, counter) entries whose merged survivors are guaranteed to
  * include every item with true frequency > n/k, no matter how large the
  * item vocabulary grows.
  *
  * Update is the classic frequent-items step: increment a present key,
  * insert while below capacity, otherwise decrement EVERY counter and
  * drop zeros (each decrement retires k−1 increments, so the amortized
  * cost is O(1) and any item appearing more than n/k times cannot be
  * decremented to zero every time). Merge follows the mergeable-summaries
  * construction (Agarwal et al., PODS '12): add counters pointwise, and
  * if more than k−1 survive, subtract the k-th largest counter from all
  * and drop the non-positive — total error stays ≤ n/k, preserving the
  * superset guarantee under ANY merge tree, which is what makes the
  * aggregate safe for Spark's partial-aggregation shape (each mapper
  * summarizes its split; the exchange carries ≤ k−1 entries per mapper).
  *
  * The counters themselves are order-dependent underestimates — callers
  * wanting exact output re-count the ≤ k−1 candidates in a second pass
  * (see `TextOps.heavyHitters`): candidates broadcast, so the recheck is
  * a semi-join + grouped count, never a full-vocabulary shuffle. eval()
  * therefore returns only the candidate ITEMS (sorted), not the noisy
  * counts.
  */
case class MisraGriesCandidates(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  private def cap = k - 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 2)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires k >= 2, got $k")
    else if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string column, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_candidates"

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      buf.get(v) match {
        case Some(c) => buf.update(v, c + 1L)
        case None if buf.size < cap =>
          buf.update(v.clone(), 1L) // own the bytes: eval may reuse buffers
        case None =>
          // decrement-all; dropping zeros keeps |buf| ≤ cap
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buf.keysIterator.foreach { key =>
            val c = buf(key) - 1L
            if (c == 0L) dead += key else buf.update(key, c)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreach { case (key, c) =>
      buf.update(key, buf.getOrElse(key, 0L) + c) // deserialized keys are owned
    }
    if (buf.size > cap) {
      // subtract the (cap+1)-th largest counter from all, drop ≤ 0: at
      // most cap counters strictly exceed it, and every survivor's loss
      // is bounded by one more "decrement" — the mergeable-MG step
      val t = buf.values.toArray.sortWith(_ > _).apply(cap)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.keysIterator.foreach { key =>
        val c = buf(key) - t
        if (c <= 0L) dead += key else buf.update(key, c)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sortWith(_.compareTo(_) < 0)
        .map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, c) =>
      val bytes = key.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val arr = new Array[Byte](len)
      in.readFully(arr)
      buf.update(UTF8String.fromBytes(arr), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesCandidates =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesCandidates =
    copy(child = newChild)
}
