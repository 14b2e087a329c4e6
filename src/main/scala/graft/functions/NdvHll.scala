package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Impala-formula HyperLogLog NDV: 1024 buckets over an FNV-1a 64 value
  * hash, harmonic-mean estimator with small-range linear counting.
  *
  * Mirrors the reference's `ndv` UDA (`be/src/exprs/aggregate-functions.h:
  * 170-184`: HLL_PRECISION=10, buckets store the max leading-zero rank of
  * the remaining hash bits) re-expressed as a Spark
  * `TypedImperativeAggregate`: Init/Update/Merge/Serialize/Finalize map
  * 1:1 onto createAggregationBuffer/update/merge/serialize/eval. The
  * 1 KiB buffer merges associatively (bucket-wise max), so partial
  * aggregation and AQE re-planning are safe at any scale.
  */
case class NdvHll(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val P = 10
  private val M = 1 << P // 1024 buckets

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  /** Hash the value's native byte representation (the reference hashes
    * raw slot bytes, not string forms — better FNV dispersion too).
    */
  private def hashValue(v: Any): Long = v match {
    case s: UTF8String => FnvHash64.hash64(s.getBytes)
    case b: Array[Byte] => FnvHash64.hash64(b)
    case l: java.lang.Long => FnvHash64.hashFixed(l.longValue(), 8)
    case i: java.lang.Integer => FnvHash64.hashFixed(i.longValue(), 4)
    case s: java.lang.Short => FnvHash64.hashFixed(s.longValue(), 2)
    case b: java.lang.Byte => FnvHash64.hashFixed(b.longValue(), 1)
    case d: java.lang.Double =>
      FnvHash64.hashFixed(java.lang.Double.doubleToLongBits(d.doubleValue()), 8)
    case f: java.lang.Float =>
      FnvHash64.hashFixed(java.lang.Float.floatToIntBits(f.floatValue()).toLong, 4)
    case b: java.lang.Boolean =>
      FnvHash64.hashFixed(if (b.booleanValue()) 1L else 0L, 1)
    case other => FnvHash64.hash64(
      UTF8String.fromString(other.toString).getBytes)
  }

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // murmur3 fmix64 finalizer on top of FNV: sequential/short inputs
      // leave FNV without full avalanche, which skews both the bucket
      // distribution and the geometric rank statistic
      var h = hashValue(v)
      h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
      h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
      h ^= h >>> 33
      // Low bits pick the bucket, rank = trailing zeros of the rest + 1 —
      // FNV's avalanche is weakest in the high bits on short inputs, and
      // this matches the reference's bucket/rank choice
      // (aggregate-functions.cc HllUpdate: hash % buckets, ctz of rest).
      val idx = (h & (M - 1)).toInt
      val rest = h >>> P
      val rank = (if (rest == 0L) 64 - P
        else java.lang.Long.numberOfTrailingZeros(rest)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) {
      if (b(i) > a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var harmonic = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      harmonic += 1.0 / (1L << buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / M) // bias correction, m >= 128
    var est = alpha * M * M / harmonic
    // small-range correction: linear counting below 2.5m with empty buckets
    if (est <= 2.5 * M && zeros > 0) {
      est = M * math.log(M.toDouble / zeros)
    }
    math.round(est)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(offset: Int): NdvHll =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): NdvHll =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NdvHll =
    copy(child = newChildren.head)

  override def prettyName: String = "ndv_hll"
}
