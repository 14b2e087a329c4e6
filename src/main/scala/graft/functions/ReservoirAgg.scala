package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType, NumericType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Reservoir state: up to `cap` sampled doubles + the count of rows seen.
  * Weights follow the reference's scheme: each kept sample carries the
  * implicit weight seen/cap once the reservoir is full.
  *
  * The RNG seed mixes in the creating task's partition id so sampling
  * decisions are uncorrelated across partitions (identical fixed seeds
  * would make every partition keep/drop the same positions).
  */
final class Reservoir(val cap: Int, seed: Long = 6364136223846793005L) {
  var seen: Long = 0L
  var n: Int = 0
  val values: Array[Double] = new Array[Double](cap)
  private val rng = new java.util.Random(seed)

  private def nextNonNeg(bound: Long): Long = {
    val j = rng.nextLong() % bound
    if (j < 0) j + bound else j
  }

  def add(v: Double): Unit = {
    seen += 1
    if (n < cap) { values(n) = v; n += 1 }
    else {
      val idx = nextNonNeg(seen)
      if (idx < cap) values(idx.toInt) = v
    }
  }

  /** Weighted merge (the reference's ReservoirSampleMerge keeps a weighted
    * random subset of the union via per-sample random keys; we draw each
    * output slot from one side with probability proportional to that
    * side's `seen` count, without replacement within a side). If the union
    * fits under `cap` both complete sample sets are kept verbatim.
    */
  def mergeFrom(o: Reservoir): Unit = {
    if (o.seen == 0) return
    if (seen == 0) {
      Array.copy(o.values, 0, values, 0, o.n)
      n = o.n; seen = o.seen
      return
    }
    val total = seen + o.seen
    if (n + o.n <= cap) {
      Array.copy(o.values, 0, values, n, o.n)
      n += o.n; seen = total
      return
    }
    // Shuffle within each side so "take the next element" is a uniform
    // draw without replacement, then fill `cap` slots choosing sides
    // proportionally to their seen-row weights.
    val mine = java.util.Arrays.copyOf(values, n)
    val theirs = java.util.Arrays.copyOf(o.values, o.n)
    shuffleInPlace(mine); shuffleInPlace(theirs)
    var mi = 0; var ti = 0; var out = 0
    val outCap = math.min(cap, mine.length + theirs.length)
    while (out < outCap) {
      val takeMine =
        if (ti >= theirs.length) true
        else if (mi >= mine.length) false
        else nextNonNeg(total) < seen
      if (takeMine) { values(out) = mine(mi); mi += 1 }
      else { values(out) = theirs(ti); ti += 1 }
      out += 1
    }
    n = out; seen = total
  }

  private def shuffleInPlace(a: Array[Double]): Unit = {
    var i = a.length - 1
    while (i > 0) {
      val j = nextNonNeg(i + 1).toInt
      val t = a(i); a(i) = a(j); a(j) = t
      i -= 1
    }
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

  /** Per-task seed: stable across retries of the same partition, distinct
    * across partitions (splitmix-style bit mix of the partition id).
    */
  def taskSeed(): Long = {
    val pid = Option(TaskContext.get()).map(_.partitionId()).getOrElse(-1)
    var z = 6364136223846793005L + (pid + 1).toLong * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def deserialize(bytes: Array[Byte], cap: Int): Reservoir = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val r = new Reservoir(cap, taskSeed())
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

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: NumericType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a numeric child, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Reservoir =
    new Reservoir(Reservoir.DefaultCap, Reservoir.taskSeed())

  override def update(r: Reservoir, input: InternalRow): Reservoir = {
    val v = child.eval(input)
    if (v != null) r.add(v match {
      case d: java.lang.Double => d.doubleValue()
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
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

/** sample(x): comma-joined sampled values in reservoir order — the
  * reference's `sample()` string aggregate (ReservoirSampleFinalize at
  * `be/src/exprs/aggregate-functions.cc:1074-1092` joins samples with
  * ", " unsorted). Output is nondeterministic by design (which rows are
  * kept depends on scan order), so it is rows-only checked; distribution
  * properties are asserted in ReservoirSpec.
  */
case class SampleAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ReservoirBackedAgg {

  override def dataType: DataType = StringType

  override def eval(r: Reservoir): Any = {
    if (r.n == 0) return null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < r.n) {
      if (i > 0) sb.append(", ")
      sb.append(fmt(r.values(i)))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // integral doubles print without the trailing ".0" (matches the
  // reference's C++ ostream formatting for whole values)
  private def fmt(v: Double): String =
    if (v == math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  override def withNewMutableAggBufferOffset(o: Int): SampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SampleAgg = copy(child = c.head)
  override def prettyName: String = "sample"
}
