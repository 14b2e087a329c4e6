package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Flajolet-Martin probabilistic counting — the reference's
  * `distinctpc`/`distinctpcsa` UDAs (`be/src/exprs/aggregate-functions.cc:
  * 695-884`): a 64-row x 32-bit bitmap matrix; plain PC sets one bit per
  * (row, trailing-zero-count of a per-row-seeded hash), PCSA (stochastic
  * averaging) picks the row from the hash and sets one bit total.
  * Finalize counts the leading run of ones per row and applies the FM
  * estimator with the reference's small-cardinality correction
  * (2^avg - 2^(avg*PC_K)) / PC_THETA; PCSA multiplies by the row count.
  *
  * The bitmap ORs associatively, so partial aggregation/merge is safe at
  * any scale. Hashing is bit-exact with the reference's
  * `AnyValUtil::Hash` (seeded CRC32-C of the value's native slot bytes,
  * the SSE4.2 path its release binaries take), so the estimates match
  * the reference corpus' pinned distinctpc/distinctpcsa values exactly.
  */
abstract class PcBackedAgg extends TypedImperativeAggregate[Array[Int]] {
  def child: Expression
  def stochastic: Boolean

  final val NumBitmaps = 64
  final val BitmapLen = 32
  // the reference's constants are FLOATs (PC_THETA = 0.77351f) — keep the
  // float-rounded values so truncated estimates agree at the boundaries
  final val Theta = 0.77351f.toDouble
  final val K = -1.75f.toDouble

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Int] = new Array[Int](NumBitmaps)

  /** `AnyValUtil::Hash` — seeded raw CRC32-C of the native slot bytes
    * (per-bitmap seed is the hash-function index, PcUpdate's scheme).
    */
  private def hash32(v: Any, seed: Int): Int =
    ImpalaValHash.hash32(v, child.dataType, seed)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v == null) return buf
    if (stochastic) {
      val h = hash32(v, 0)
      val row = java.lang.Integer.remainderUnsigned(h, NumBitmaps)
      val rest = java.lang.Integer.divideUnsigned(h, NumBitmaps)
      val bit =
        if (h == 0) BitmapLen - 1
        else math.min(java.lang.Integer.numberOfTrailingZeros(rest), BitmapLen - 1)
      buf(row) |= (1 << bit)
    } else {
      var i = 0
      while (i < NumBitmaps) {
        val h = hash32(v, i)
        val bit =
          if (h == 0) BitmapLen - 1
          else java.lang.Integer.numberOfTrailingZeros(h)
        buf(i) |= (1 << bit)
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < NumBitmaps) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    if (buf.forall(_ == 0)) return 0L
    var sum = 0
    var i = 0
    while (i < NumBitmaps) {
      // leading run of ones = trailing zeros of the complement
      val run = java.lang.Integer.numberOfTrailingZeros(~buf(i))
      sum += math.min(run, BitmapLen)
      i += 1
    }
    val avg = sum.toDouble / NumBitmaps
    val est = (math.pow(2.0, avg) - math.pow(2.0, avg * K)) / Theta
    val scaled = if (stochastic) est * NumBitmaps else est
    scaled.toLong
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(NumBitmaps * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(NumBitmaps)(bb.getInt())
  }
}

case class PcAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends PcBackedAgg {
  override def stochastic: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): PcAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PcAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PcAgg = copy(child = c.head)
  override def prettyName: String = "distinctpc"
}

case class PcsaAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends PcBackedAgg {
  override def stochastic: Boolean = true
  override def withNewMutableAggBufferOffset(o: Int): PcsaAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PcsaAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PcsaAgg = copy(child = c.head)
  override def prettyName: String = "distinctpcsa"
}
