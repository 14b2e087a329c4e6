package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reservoir state: up to `cap` sampled doubles + the count of rows seen.
  * Weights follow the reference's scheme: each kept sample carries the
  * implicit weight seen/cap once the reservoir is full.
  */
final class Reservoir(val cap: Int) {
  var seen: Long = 0L
  var n: Int = 0
  val values: Array[Double] = new Array[Double](cap)
  // deterministic per-buffer RNG seed keeps single-partition runs stable
  private var rng = new java.util.Random(6364136223846793005L)

  def add(v: Double): Unit = {
    seen += 1
    if (n < cap) { values(n) = v; n += 1 }
    else {
      val j = rng.nextLong() % seen
      val idx = (if (j < 0) j + seen else j)
      if (idx < cap) values(idx.toInt) = v
    }
  }

  def mergeFrom(o: Reservoir): Unit = {
    // Weighted merge as in the reference (aggregate-functions.cc
    // ReservoirSampleMerge): sub-sample the union proportionally.
    var i = 0
    if (seen == 0) {
      Array.copy(o.values, 0, values, 0, o.n)
      n = o.n; seen = o.seen
      return
    }
    if (o.seen == 0) return
    // both non-empty: fill remaining capacity, then probabilistic replace
    while (i < o.n) {
      val v = o.values(i)
      if (n < cap) { values(n) = v; n += 1 }
      else {
        // replace with probability o.seen/(seen+o.seen) scaled per element
        val j = rng.nextLong() % (seen + o.seen)
        val idx = if (j < 0) j + seen + o.seen else j
        if (idx < cap) values(idx.toInt) = v
      }
      i += 1
    }
    seen += o.seen
  }

  def serialize(): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeLong(seen); out.writeInt(n)
    var i = 0
    while (i < n) { out.writeDouble(values(i)); i += 1 }
    out.flush(); bos.toByteArray
  }
}

object Reservoir {
  val DefaultCap = 20000 // the reference's NUM_SAMPLES*NUM_BUCKETS bound

  def deserialize(bytes: Array[Byte], cap: Int): Reservoir = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val r = new Reservoir(cap)
    r.seen = in.readLong()
    r.n = in.readInt()
    var i = 0
    while (i < r.n) { r.values(i) = in.readDouble(); i += 1 }
    r
  }
}

/** Base for the reference's reservoir-backed aggregates
  * (`be/src/exprs/aggregate-functions.h:126-167`: ReservoirSample,
  * Histogram, AppxMedian share one 20k reservoir).
  */
abstract class ReservoirBackedAgg extends TypedImperativeAggregate[Reservoir] {
  def child: Expression
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true

  override def createAggregationBuffer(): Reservoir =
    new Reservoir(Reservoir.DefaultCap)

  override def update(r: Reservoir, input: InternalRow): Reservoir = {
    val v = child.eval(input)
    if (v != null) r.add(v match {
      case d: java.lang.Double => d.doubleValue()
      case n: java.lang.Number => n.doubleValue()
    })
    r
  }

  override def merge(a: Reservoir, b: Reservoir): Reservoir = { a.mergeFrom(b); a }
  override def serialize(r: Reservoir): Array[Byte] = r.serialize()
  override def deserialize(bytes: Array[Byte]): Reservoir =
    Reservoir.deserialize(bytes, Reservoir.DefaultCap)
}

/** histogram(x): comma-joined equi-height bucket boundaries (34 buckets
  * like the reference's output format).
  */
case class HistogramAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ReservoirBackedAgg {

  override def dataType: DataType = StringType

  override def eval(r: Reservoir): Any = {
    if (r.n == 0) return null
    val sorted = java.util.Arrays.copyOf(r.values, r.n)
    java.util.Arrays.sort(sorted)
    val buckets = 34
    val bounds = (1 to buckets).map { b =>
      val idx = math.min(sorted.length - 1,
        math.ceil(sorted.length.toDouble * b / buckets).toInt - 1)
      sorted(math.max(idx, 0))
    }
    UTF8String.fromString(bounds.mkString(", "))
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HistogramAgg = copy(child = c.head)
  override def prettyName: String = "histogram"
}

/** appx_median_rs(x): reservoir median (the reference's appx_median). */
case class AppxMedianAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ReservoirBackedAgg {

  override def dataType: DataType = DoubleType

  override def eval(r: Reservoir): Any = {
    if (r.n == 0) return null
    val sorted = java.util.Arrays.copyOf(r.values, r.n)
    java.util.Arrays.sort(sorted)
    sorted(sorted.length / 2)
  }

  override def withNewMutableAggBufferOffset(o: Int): AppxMedianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AppxMedianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AppxMedianAgg = copy(child = c.head)
  override def prettyName: String = "appx_median_rs"
}
