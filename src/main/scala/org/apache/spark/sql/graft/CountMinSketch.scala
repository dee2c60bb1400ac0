package org.apache.spark.sql.graft

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/** Count-min sketch (Cormode & Muthukrishnan 2005) over an integer key
  * column as one mergeable TypedImperativeAggregate: 4 hash rows × 64
  * buckets of exact BIGINT counters, one flat long[256] buffer per
  * partition, counter-wise `+` on merge — the point-frequency companion
  * to the approx_top_k heavy-hitters sketch (agg_topk_sketch). At scale
  * the shuffle carries one 2 KB row per partition instead of one row
  * per key, and pre-aggregated sketches union across days/sources by
  * the same merge.
  *
  * The hash family is DELIBERATELY SQL-replayable (multiplicative
  * constants + offset, mod 2^32, top-6-bits bucket — all BIGINT-exact
  * `* + % //` for keys in [0, 2^31)): the DuckDB oracle rebuilds the
  * identical sketch relationally and proves every counter the engine
  * path produces, which no opaque-hash sketch can offer. Keys outside
  * the replayable domain fail loudly rather than silently wrapping
  * differently from the oracle.
  */
object CountMinSketchAgg {
  val Depth = 4
  val Width = 64
  /** Per-row multipliers (xxhash/Knuth odd constants) and offsets —
    * shared verbatim with the oracle SQL. */
  val P: Seq[Long] = Seq(2654435761L, 2246822519L, 3266489917L, 668265263L)
  val B: Seq[Long] = Seq(0L, 12345L, 67890L, 13579L)
  val KeyBound: Long = 1L << 31

  /** Bucket of key `k` in hash row `j` — the one formula both the
    * aggregate's update path and the SQL fragments encode. */
  def bucket(k: Long, j: Int): Int =
    (((k * P(j) + B(j)) % 4294967296L) >> 26).toInt

  /** The same bucket as ANSI SQL over an expression (Spark `DIV` /
    * DuckDB `//` spelled by the caller). */
  def bucketSql(expr: String, j: Int, intDiv: String): String =
    s"((($expr * ${P(j)} + ${B(j)}) % 4294967296) $intDiv 67108864)"
}

case class CountMinSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with ExpectsInputTypes {

  import CountMinSketchAgg._

  override def inputTypes: Seq[AbstractDataType] = Seq(LongType)
  override def dataType: DataType = ArrayType(LongType)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "count_min_sketch_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Long]
      require(k >= 0 && k < KeyBound,
        s"count-min key $k outside [0, 2^31) — the SQL-replayable hash domain")
      var j = 0
      while (j < Depth) {
        buf(j * Width + bucket(k, j)) += 1L
        j += 1
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

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinSketchAgg =
    copy(child = newChildren.head)
}
