package graft.expr

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native typed-imperative aggregate: Misra–Gries heavy-hitters summary
  * over a string column with bounded memory (at most `k` counters per
  * aggregation buffer), in one pass.
  *
  * Returns array<struct<tok: string, est: bigint>> — the surviving
  * candidates with their (under-)estimated counts. Standard guarantees
  * (Misra–Gries '82; merge rule from Agarwal et al. '13 mergeable
  * summaries): after observing N items, every item with true frequency
  * > N/(k+1) is PRESENT in the summary, and each estimate undercounts by
  * at most N/(k+1). Partial buffers merge by pointwise addition followed
  * by subtracting the (k+1)-th largest count — commutative and
  * order-insensitive w.r.t. the guarantee, so map-side partial
  * aggregation and AQE re-planning are safe.
  *
  * This is the 100 TB shape for "top tokens over a corpus": the shuffle
  * carries one k-entry summary per partition instead of one row per
  * distinct token. Exact output semantics come from the verify pattern
  * (q_text_heavy): recount ONLY the candidates exactly, then keep
  * cnt·(k+1) > N — the guarantee makes the candidate set a superset of
  * that output, so the sketch accelerates without approximating.
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]]
  with UnaryLike[Expression] {

  require(k > 0, "heavy-hitters capacity k must be positive")

  override def prettyName: String = "heavy_hitters_agg"

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("est", LongType, nullable = false))))

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buf: mutable.HashMap[UTF8String, Long], input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // copy: the incoming UTF8String may point into a reused row buffer
      val t = v.asInstanceOf[UTF8String]
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None =>
          if (buf.size < k) buf.update(t.copy(), 1L)
          else decrementAll(buf)
      }
    }
    buf
  }

  /** Classic MG step: an unmatched arrival beyond capacity decrements
    * every counter; zeros drop out. */
  private def decrementAll(buf: mutable.HashMap[UTF8String, Long]): Unit = {
    val dead = mutable.ArrayBuffer.empty[UTF8String]
    buf.foreachEntry { (t, c) => if (c == 1L) dead += t else buf.update(t, c - 1) }
    dead.foreach(buf.remove)
  }

  override def merge(
      buf: mutable.HashMap[UTF8String, Long],
      other: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    other.foreachEntry { (t, c) => buf.update(t, buf.getOrElse(t, 0L) + c) }
    if (buf.size > k) {
      // subtract the (k+1)-th largest count from all; drop non-positive
      val counts = buf.values.toArray.sortInPlace()(Ordering[Long].reverse)
      val sub = counts(k)
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      buf.foreachEntry { (t, c) => if (c - sub <= 0L) dead += t else buf.update(t, c - sub) }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[UTF8String, Long]): Any = {
    // deterministic output order: token ascending
    val entries = buf.toArray.sortWith((a, b) => a._1.compareTo(b._1) < 0)
    new GenericArrayData(entries.map { case (t, c) =>
      new GenericInternalRow(Array[Any](t, c))
    })
  }

  override def serialize(buf: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    val payload = buf.toSeq.map { case (t, c) => (t.getBytes, c) }
    val size = 4 + payload.map(4 + _._1.length + 8).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(payload.size)
    payload.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val buf = mutable.HashMap.empty[UTF8String, Long]
    (0 until n).foreach { _ =>
      val len = bb.getInt()
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(UTF8String.fromBytes(b), bb.getLong())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)
}
