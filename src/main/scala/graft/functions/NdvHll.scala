package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Impala-formula HyperLogLog NDV, bit-exact with the reference's `ndv`
  * UDA (`be/src/exprs/aggregate-functions.cc` HllUpdate/HllFinalEstimate,
  * HLL_PRECISION=10): MurmurHash2_64 of the value's native slot bytes
  * seeded with FNV64_SEED, low 10 bits pick the bucket, rank =
  * ctz(hash>>10)+1, float-precision harmonic estimator with the HLL++
  * k-NN bias correction below 5m and the threshold-gated linear-counting
  * fallback — so the reference corpus' pinned ndv values reproduce
  * exactly. Re-expressed as a Spark `TypedImperativeAggregate`:
  * Init/Update/Merge/Serialize/Finalize map 1:1 onto
  * createAggregationBuffer/update/merge/serialize/eval. The 1 KiB buffer
  * merges associatively (bucket-wise max), so partial aggregation and
  * AQE re-planning are safe at any scale.
  */
case class NdvHll(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    finalizeEstimate: Boolean = true)
  extends TypedImperativeAggregate[Array[Byte]] {

  private val P = 10
  private val M = 1 << P // 1024 buckets

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  // ndv_no_finalize (BuiltinsDb.java "ndv_no_finalize") returns the raw
  // 1 KiB intermediate sketch instead of the estimate — the form the
  // reference's incremental-stats child queries persist per partition
  // and re-merge later
  override def dataType: DataType =
    if (finalizeEstimate) LongType else BinaryType

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // AnyValUtil::Hash64: MurmurHash2_64 over native slot bytes, seeded
      // with FNV64_SEED (aggregate-functions.cc:1146)
      val h = ImpalaValHash.hash64(v, child.dataType, ImpalaValHash.Fnv64Seed)
      // HllUpdate skips a zero hash entirely; low bits pick the bucket,
      // rank = ctz(hash >> 10) + 1
      if (h != 0L) {
        val idx = (h & (M - 1)).toInt
        val rest = h >>> P
        val rank = (if (rest == 0L) 64 - P
          else java.lang.Long.numberOfTrailingZeros(rest)) + 1
        if (rank > buf(idx)) buf(idx) = rank.toByte
      }
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
    if (!finalizeEstimate) return buf.clone()
    // HllFinalEstimate, float-for-float: powf harmonic sum accumulated in
    // FLOAT (C `float harmonic_mean`), float alpha, int64 truncation
    var harmonic: Float = 0f
    var zeros = 0
    var i = 0
    while (i < M) {
      harmonic += math.pow(2.0, -buf(i)).toFloat
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    harmonic = 1.0f / harmonic
    val alpha: Float = 0.7213f / (1f + 1.079f / M)
    var estimate: Long = (alpha * M * M * harmonic).toLong
    // HLL++ bias adjustment below 5m (HllEstimateBias k-NN interpolation)
    if (estimate <= 5L * M) estimate -= HllBias.estimateBias(estimate)
    if (zeros == 0) return estimate
    // linear counting when low-cardinality (threshold for precision 10)
    val h: Long = (M * math.log((M.toFloat / zeros).toDouble).toFloat).toLong
    if (h <= 900.0f) h else estimate
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

  override def prettyName: String =
    if (finalizeEstimate) "ndv_hll" else "ndv_no_finalize"
}
