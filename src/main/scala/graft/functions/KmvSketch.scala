package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k theta) sketch — the set-operation
  * sketch the HLL family can't give: two sketches support UNION,
  * INTERSECTION and Jaccard estimates between corpus slices (snapshot
  * overlap, source contamination, cross-shard dedup rates) from
  * 2 * k longs, one corpus pass each.
  *
  * DETERMINISM is the engine-wide sampling rule (sampleStratified /
  * prioritySample): the "uniform" per value is NOT an RNG but the
  * first 13 hex chars of md5(value) as an integer in [0, 2^52) — both
  * engines compute the identical hash, so the sketch CONTENT is
  * hash-checkable, not just its estimates. The aggregate itself is
  * hash-agnostic: it keeps the k smallest DISTINCT longs of its input
  * column (the caller supplies conv(substr(md5(x),1,13),16,10); the
  * DuckDB oracle mirrors CAST('0x' || SUBSTR(MD5(x),1,13) AS BIGINT)).
  *
  * Estimators (public literature — Bar-Yossef et al. 2002 KMV;
  * Dasu/Johnson theta unions): with u_k = k-th smallest normalized
  * hash, NDV ~ (k-1)/u_k (exact distinct count below k); for two
  * sketches theta = min(theta_A, theta_B), candidates = sketch
  * entries < theta, union ~ |candidates|/theta, intersection ~
  * |in both|/theta. Every division is a single correctly-rounded IEEE
  * op on exact operands, so estimates hash-match across engines.
  *
  * Scale shape: map-side-combinable TypedImperativeAggregate, k longs
  * of state per group (k = 256 default — the reference's NDV sketch
  * class), merge = sorted-set union truncated to k.
  */
final class KmvBuffer(val k: Int) {
  // bounded sorted distinct set of the k smallest values seen
  val set: java.util.TreeSet[java.lang.Long] = new java.util.TreeSet()

  def add(v: Long): Unit = {
    if (set.size < k) { set.add(v); () }
    else if (v < set.last()) {
      if (set.add(v)) { set.remove(set.last()); () }
    }
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    val it = o.set.iterator()
    while (it.hasNext) add(it.next())
  }

  def toArray: Array[Long] = {
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def serialize(): Array[Byte] = {
    val arr = toArray
    val bb = java.nio.ByteBuffer.allocate(8 + 8 * arr.length)
    bb.putInt(k); bb.putInt(arr.length)
    arr.foreach(bb.putLong)
    bb.array()
  }
}

object KmvBuffer {
  val DefaultK = 256

  def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(bb.getInt())
    val n = bb.getInt()
    var i = 0
    while (i < n) { b.add(bb.getLong()); i += 1 }
    b
  }
}

/** kmv_sketch(hash_long): ARRAY<BIGINT> of the k smallest distinct
  * input values, ascending — the serialized sketch.
  */
case class KmvAgg(
    child: Expression,
    k: Int = KmvBuffer.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KmvBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires an integer hash column, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val v = child.eval(input)
    if (v != null) b.add(v match {
      case l: java.lang.Long => l.longValue()
      case i: java.lang.Integer => i.longValue()
    })
    b
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    a.mergeFrom(b); a
  }

  override def eval(b: KmvBuffer): Any = new GenericArrayData(b.toArray)
  override def serialize(b: KmvBuffer): Array[Byte] = b.serialize()
  override def deserialize(bytes: Array[Byte]): KmvBuffer =
    KmvBuffer.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KmvAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvAgg =
    copy(child = newChildren.head)
  override def prettyName: String = "kmv_sketch"
}
