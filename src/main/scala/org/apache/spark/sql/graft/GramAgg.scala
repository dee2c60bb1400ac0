package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Fused integer scatter-matrix moments over an Array[Long] level column
  * of fixed dimension `dim`: one pass accumulates count n, the per-dim
  * sums Σx, and the full dim×dim gram Σx·xᵀ into a single long[] buffer
  * (layout: [0] = n, [1..dim] = sums, [dim+1 ..] = gram row-major).
  *
  * vec_pca_power previously made THREE corpus passes for the same
  * numbers — a count(), a posexplode(dim)-per-row sum, and a
  * posexplode(dim²)-per-row gram whose per-row 4096-element HOF array
  * build dominated the query (guide §1.2 step 2 / §4: per-row boxed
  * expression eval in the hot path). This aggregate is the
  * FusedHistogram recipe applied to the scatter accumulation: a native
  * while-loop MAC per row, one merged row per partition on the wire,
  * and the exact same BIGINT sums (integer addition is order-free, so
  * fusing passes cannot change a bit). The DuckDB oracle is unchanged.
  */
case class GramAgg(
    child: Expression,
    dim: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "gram_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](1 + dim + dim * dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == dim,
        s"gram_agg expects exactly $dim levels, got ${arr.numElements()}")
      val x = new Array[Long](dim)
      var i = 0
      while (i < dim) { x(i) = arr.getLong(i); i += 1 }
      buf(0) += 1L
      i = 0
      while (i < dim) {
        val xi = x(i)
        buf(1 + i) += xi
        val base = 1 + dim + i * dim
        var j = 0
        while (j < dim) { buf(base + j) += xi * x(j); j += 1 }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): GramAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): GramAgg =
    copy(child = newChildren.head)
}
