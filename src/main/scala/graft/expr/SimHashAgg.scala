package graft.expr

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Native typed-imperative aggregate: 64-bit SimHash signature from a
  * column of 64-bit feature hashes in ONE aggregation pass.
  *
  * Buffer = 64 signed bit-votes (+1 if the feature hash has bit j set,
  * −1 otherwise); eval folds the votes into the signature (bit j set iff
  * vote >= 0 — ties pinned to 1). Replaces the 64-separate-sum-aggregates
  * formulation: one 256-byte buffer per group instead of 64 agg buffers,
  * and one pass over each input hash. Exactly commutative/associative, so
  * partial aggregation and AQE re-partitioning cannot change results.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def prettyName: String = "simhash_agg"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        buffer(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { buffer(j) += other(j); j += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = {
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (buffer(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override def serialize(buffer: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buffer.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimHashAgg =
    copy(child = newChild)
}
