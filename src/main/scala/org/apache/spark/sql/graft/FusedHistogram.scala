package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpectsInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, LongType}

/** Fused fixed-width histogram over an Array[Double] column as a single
  * TypedImperativeAggregate — the custom aggregate SURVEY.md §4 flags as
  * the one operator worth dropping below the DataFrame API for (the
  * reference's F2 histogram, image_classification.py:136-171).
  *
  * The relational formulation (vec_histogram: posexplode → groupBy)
  * shuffles one row per element per partition; this operator keeps ONE
  * long[] buffer per partition and shuffles a single row per partition —
  * for a 30k-bin HSV histogram over 100 TB of vectors that's the
  * difference between a elements-count shuffle and a partitions-count
  * shuffle.
  *
  * Bucketing matches vec_histogram exactly: bucket =
  * clamp(floor((x − lo)·nbins/(hi − lo)), −1, nbins) with the same
  * double arithmetic, so the DuckDB oracle for one validates the other.
  */
case class FusedHistogram(
    child: Expression,
    lo: Double,
    hi: Double,
    nbins: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "fused_histogram"

  // buckets -1 (underflow) .. nbins (overflow) → nbins + 2 slots
  override def createAggregationBuffer(): Array[Long] = new Array[Long](nbins + 2)

  private val scale = nbins / (hi - lo)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val x = arr.getDouble(i)
          var b = math.floor((x - lo) * scale).toLong
          if (b < -1L) b = -1L
          if (b > nbins.toLong) b = nbins.toLong
          buf((b + 1).toInt) += 1L
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FusedHistogram =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FusedHistogram =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FusedHistogram =
    copy(child = newChildren.head)
}
