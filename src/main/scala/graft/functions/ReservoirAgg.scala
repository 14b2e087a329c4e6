package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.TaskContext
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, DateType, DecimalType, DoubleType, FloatType, NumericType, StringType, TimestampNTZType, TimestampType}
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
    * output slot from one side WITHOUT replacement, with probability
    * proportional to that side's REMAINING unconsumed weight — per-sample
    * weight is seen/n, so a side's remaining weight shrinks as it is
    * consumed. A fixed seen/total draw probability would over-sample the
    * larger side's tail once the smaller side depletes). If the union
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
    // proportionally to their remaining seen-row weights.
    val mine = java.util.Arrays.copyOf(values, n)
    val theirs = java.util.Arrays.copyOf(o.values, o.n)
    shuffleInPlace(mine); shuffleInPlace(theirs)
    val wMine = seen.toDouble / mine.length
    val wTheirs = o.seen.toDouble / theirs.length
    var mi = 0; var ti = 0; var out = 0
    val outCap = math.min(cap, mine.length + theirs.length)
    while (out < outCap) {
      val takeMine =
        if (ti >= theirs.length) true
        else if (mi >= mine.length) false
        else {
          val remMine = wMine * (mine.length - mi)
          val remTheirs = wTheirs * (theirs.length - ti)
          rng.nextDouble() * (remMine + remTheirs) < remMine
        }
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

/** histogram(x): comma-joined equi-height bucket boundaries, exactly the
  * reference's HistogramFinalize (`aggregate-functions.cc:1095-1110`):
  * min(n, 100) buckets, samples_per_bucket = max(n/100, 1), boundary =
  * sample[(b+1)*spb - 1]; below 100 samples the output IS the sorted
  * sample. Whole values print without a trailing ".0" (C++ ostream).
  */
case class HistogramAgg(
    child: Expression,
    render: String = "num",
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ReservoirBackedAgg {

  override def dataType: DataType = StringType

  override def eval(r: Reservoir): Any = {
    if (r.n == 0) return null
    val sorted = java.util.Arrays.copyOf(r.values, r.n)
    java.util.Arrays.sort(sorted)
    val numBuckets = math.min(sorted.length, 100)
    val samplesPerBucket = math.max(sorted.length / 100, 1)
    val bounds = (0 until numBuckets).map { b =>
      fmt(sorted((b + 1) * samplesPerBucket - 1))
    }
    UTF8String.fromString(bounds.mkString(", "))
  }

  // `render` keeps the INPUT type's own printing (the reference's
  // histogram is defined per type and renders each sample as its type):
  // "float" prints the float's shortest repr, "ts" re-interprets the
  // buffered value as epoch seconds and prints a timestamp.
  private def fmt(v: Double): String = render match {
    case "ts" =>
      val micros = Math.rint(v * 1e6).toLong
      val secs = Math.floorDiv(micros, 1000000L)
      val frac = Math.floorMod(micros, 1000000L)
      val ldt = java.time.LocalDateTime.ofEpochSecond(
        secs, 0, java.time.ZoneOffset.UTC)
      val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
        f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
        f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
      if (frac == 0) base else f"$base.$frac%06d"
    case "float" =>
      if (v == math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
        v.toLong.toString
      else v.toFloat.toString
    case _ =>
      if (v == math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
        v.toLong.toString
      else v.toString
  }

  override def withNewMutableAggBufferOffset(o: Int): HistogramAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistogramAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): HistogramAgg = copy(child = c.head)
  override def prettyName: String = "histogram"
}

/** appx_median_rs(x): reservoir median (the reference's appx_median).
  * `resultType` casts the double median back to the input's type at
  * finalize (the reference's appx_median returns the argument type);
  * the default DoubleType keeps the raw reservoir value.
  */
case class AppxMedianAgg(
    child: Expression,
    resultType: DataType = DoubleType,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0) extends ReservoirBackedAgg {

  override def dataType: DataType = resultType

  override def eval(r: Reservoir): Any = {
    if (r.n == 0) return null
    val sorted = java.util.Arrays.copyOf(r.values, r.n)
    java.util.Arrays.sort(sorted)
    val m = sorted(sorted.length / 2)
    import org.apache.spark.sql.catalyst.expressions.{Cast => CCast, Literal => CLit}
    if (resultType == DoubleType) m
    // double -> NTZ has no direct cast; route via TIMESTAMP (UTC session)
    else if (resultType == TimestampNTZType)
      CCast(CCast(CLit(m, DoubleType), TimestampType, Some("UTC")),
        TimestampNTZType, Some("UTC")).eval(null)
    else CCast(CLit(m, DoubleType), resultType, Some("UTC")).eval(null)
  }

  override def withNewMutableAggBufferOffset(o: Int): AppxMedianAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AppxMedianAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AppxMedianAgg = copy(child = c.head)
  override def prettyName: String = "appx_median_rs"
}

/** appx_median over STRING input: reservoir of raw string values, median
  * by byte-wise sort (the reference's AppxMedianFinalize sorts the sample
  * with RawValue::LessThan — memcmp for strings — and takes
  * samples[num_samples/2], `be/src/exprs/aggregate-functions.cc:1119`).
  * Exact below the 20k reservoir cap, like the numeric twin.
  */
case class AppxMedianStringAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[StringReservoir] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"appx_median string path requires STRING, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): StringReservoir =
    new StringReservoir(Reservoir.DefaultCap, Reservoir.taskSeed())

  override def update(r: StringReservoir, input: InternalRow): StringReservoir = {
    val v = child.eval(input)
    // clone: the UTF8String aliases a reused scan row buffer
    if (v != null) r.add(v.asInstanceOf[UTF8String].clone())
    r
  }

  override def merge(a: StringReservoir, b: StringReservoir): StringReservoir = {
    a.mergeFrom(b); a
  }

  override def eval(r: StringReservoir): Any = {
    if (r.n == 0) return null
    val sorted = java.util.Arrays.copyOf(r.values, r.n)
    // UTF8String.compareTo is byte-wise — the reference's memcmp order
    java.util.Arrays.sort(sorted, java.util.Comparator.naturalOrder[UTF8String]())
    sorted(sorted.length / 2)
  }

  override def serialize(r: StringReservoir): Array[Byte] = r.serialize()
  override def deserialize(bytes: Array[Byte]): StringReservoir =
    StringReservoir.deserialize(bytes, Reservoir.DefaultCap)
  override def withNewMutableAggBufferOffset(o: Int): AppxMedianStringAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): AppxMedianStringAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): AppxMedianStringAgg = copy(child = c.head)
  override def prettyName: String = "appx_median"
}

/** Reservoir over rendered string values — backs the type-generic
  * `sample()`. Same sampling/merge scheme as [[Reservoir]], but elements
  * are kept as their final string rendering, so any scalar input type is
  * sampled verbatim (the reference's ReservoirSample is defined per type
  * and renders at finalize; rendering at update time is distributionally
  * identical since the rendering is injective enough for display).
  */
final class StringReservoir(val cap: Int, seed: Long = 6364136223846793005L) {
  var seen: Long = 0L
  var n: Int = 0
  val values: Array[UTF8String] = new Array[UTF8String](cap)
  private val rng = new java.util.Random(seed)

  private def nextNonNeg(bound: Long): Long = {
    val j = rng.nextLong() % bound
    if (j < 0) j + bound else j
  }

  def add(v: UTF8String): Unit = {
    seen += 1
    if (n < cap) { values(n) = v; n += 1 }
    else {
      val idx = nextNonNeg(seen)
      if (idx < cap) values(idx.toInt) = v
    }
  }

  /** Remaining-weight merge — see [[Reservoir.mergeFrom]]. */
  def mergeFrom(o: StringReservoir): Unit = {
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
    val mine = java.util.Arrays.copyOf(values, n)
    val theirs = java.util.Arrays.copyOf(o.values, o.n)
    shuffleInPlace(mine); shuffleInPlace(theirs)
    val wMine = seen.toDouble / mine.length
    val wTheirs = o.seen.toDouble / theirs.length
    var mi = 0; var ti = 0; var out = 0
    val outCap = math.min(cap, mine.length + theirs.length)
    while (out < outCap) {
      val takeMine =
        if (ti >= theirs.length) true
        else if (mi >= mine.length) false
        else {
          val remMine = wMine * (mine.length - mi)
          val remTheirs = wTheirs * (theirs.length - ti)
          rng.nextDouble() * (remMine + remTheirs) < remMine
        }
      if (takeMine) { values(out) = mine(mi); mi += 1 }
      else { values(out) = theirs(ti); ti += 1 }
      out += 1
    }
    n = out; seen = total
  }

  private def shuffleInPlace(a: Array[UTF8String]): Unit = {
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
    while (i < n) {
      val b = values(i).getBytes
      out.writeInt(b.length); out.write(b)
      i += 1
    }
    out.flush(); bos.toByteArray
  }
}

object StringReservoir {
  def deserialize(bytes: Array[Byte], cap: Int): StringReservoir = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val r = new StringReservoir(cap, Reservoir.taskSeed())
    r.seen = in.readLong()
    r.n = in.readInt()
    var i = 0
    while (i < r.n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      r.values(i) = UTF8String.fromBytes(b)
      i += 1
    }
    r
  }
}

/** sample(x): comma-joined sampled values in reservoir order — the
  * reference's `sample()` string aggregate (ReservoirSampleFinalize at
  * `be/src/exprs/aggregate-functions.cc:1074-1092` joins samples with
  * ", " unsorted). Type-generic like the reference (defined over every
  * scalar type): values are rendered to strings per the input type —
  * numerics drop a trailing ".0" (C++ ostream style), timestamps render
  * as "yyyy-MM-dd HH:mm:ss[.ffffff]", strings are kept verbatim. Output
  * is nondeterministic by design (which rows are kept depends on scan
  * order), so it is rows-only checked; distribution properties are
  * asserted in ReservoirSpec.
  */
case class SampleAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[StringReservoir] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: NumericType | StringType | BooleanType | DateType |
         TimestampType | TimestampNTZType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sample requires a scalar child, got ${other.catalogString}")
  }

  // Resolved-type renderer, bound once per task. String inputs must be
  // copied: the UTF8String handed to update() aliases a reused row buffer.
  @transient private lazy val render: Any => UTF8String = child.dataType match {
    case StringType => v => v.asInstanceOf[UTF8String].clone()
    case FloatType =>
      v => UTF8String.fromString(fmt(v.asInstanceOf[java.lang.Float].doubleValue()))
    case DoubleType =>
      v => UTF8String.fromString(fmt(v.asInstanceOf[java.lang.Double].doubleValue()))
    case _: DecimalType => v => UTF8String.fromString(
      v.asInstanceOf[org.apache.spark.sql.types.Decimal]
        .toJavaBigDecimal.toPlainString)
    case DateType => v => UTF8String.fromString(
      java.time.LocalDate.ofEpochDay(v.asInstanceOf[java.lang.Integer].longValue())
        .toString)
    case TimestampType | TimestampNTZType =>
      v => UTF8String.fromString(fmtTs(v.asInstanceOf[java.lang.Long].longValue()))
    case _ => v => UTF8String.fromString(String.valueOf(v))
  }

  // integral doubles print without the trailing ".0" (matches the
  // reference's C++ ostream formatting for whole values)
  private def fmt(v: Double): String =
    if (v == math.rint(v) && !v.isInfinite && math.abs(v) < 1e15)
      v.toLong.toString
    else v.toString

  // micros since epoch -> "yyyy-MM-dd HH:mm:ss[.ffffff]" (UTC reading,
  // matching the reference's timezone-less TimestampValue rendering;
  // fraction only when non-zero, micro precision — the ns digits the
  // reference can render are unrepresentable in Spark)
  private def fmtTs(us: Long): String = {
    val secs = Math.floorDiv(us, 1000000L)
    val frac = Math.floorMod(us, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      secs, 0, java.time.ZoneOffset.UTC)
    val base = f"${ldt.getYear}%04d-${ldt.getMonthValue}%02d-" +
      f"${ldt.getDayOfMonth}%02d ${ldt.getHour}%02d:" +
      f"${ldt.getMinute}%02d:${ldt.getSecond}%02d"
    if (frac == 0) base else f"$base.$frac%06d"
  }

  override def createAggregationBuffer(): StringReservoir =
    new StringReservoir(Reservoir.DefaultCap, Reservoir.taskSeed())

  override def update(r: StringReservoir, input: InternalRow): StringReservoir = {
    val v = child.eval(input)
    if (v != null) r.add(render(v))
    r
  }

  override def merge(a: StringReservoir, b: StringReservoir): StringReservoir = {
    a.mergeFrom(b); a
  }
  override def serialize(r: StringReservoir): Array[Byte] = r.serialize()
  override def deserialize(bytes: Array[Byte]): StringReservoir =
    StringReservoir.deserialize(bytes, Reservoir.DefaultCap)

  override def eval(r: StringReservoir): Any = {
    if (r.n == 0) return null
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < r.n) {
      if (i > 0) sb.append(", ")
      sb.append(r.values(i).toString)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def withNewMutableAggBufferOffset(o: Int): SampleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SampleAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): SampleAgg = copy(child = c.head)
  override def prettyName: String = "sample"
}


/** group_concat(value, sep) with a PER-ROW separator (the reference's
  * StringConcatUpdate appends `sep_i + value_i` for every row after the
  * first, where sep_i is that row's separator value,
  * `be/src/exprs/aggregate-functions.cc:743-775`). Input order is
  * unspecified, same as the reference. Only used when the separator is
  * non-foldable — constant separators keep Spark's codegen'd ListAgg —
  * or when `graft.group_concat.max_bytes` is set below the default.
  *
  * Accumulation is capped at `maxBytes` (default 1 GiB): the reference
  * rejects concatenations past StringVal's 1 GB limit DURING
  * accumulation, not at finalize (`QueryTest/large_strings.test`
  * "Concatenated string length larger than allowed limit of 1 GB
  * character data") — erroring early is what keeps a runaway
  * group_concat from taking down an executor at scale.
  */
case class GroupConcatSep(
    value: Expression,
    sep: Expression,
    maxBytes: Long = GroupConcatSep.MaxBytesDefault,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[GroupConcatSep.ConcatBuf] {

  type Buf = GroupConcatSep.ConcatBuf

  override def children: Seq[Expression] = Seq(value, sep)
  override def nullable: Boolean = true
  override def dataType: DataType = StringType

  override def createAggregationBuffer(): Buf = new Buf()

  private def grow(b: Buf, delta: Long): Unit = {
    b.bytes += delta
    if (b.bytes > maxBytes)
      throw new IllegalStateException(
        "Concatenated string length larger than allowed limit of 1 GB " +
          "character data")
  }

  override def update(b: Buf, input: InternalRow): Buf = {
    val v = value.eval(input)
    if (v != null) {
      val s = sep.eval(input)
      val sepStr = if (s == null) UTF8String.fromString(", ")
        else s.asInstanceOf[UTF8String].clone()
      val valStr = v.asInstanceOf[UTF8String].clone()
      grow(b, valStr.numBytes().toLong + sepStr.numBytes().toLong)
      b += ((valStr, sepStr))
    }
    b
  }

  override def merge(a: Buf, b: Buf): Buf = { grow(a, b.bytes); a ++= b; a }

  override def eval(b: Buf): Any = {
    if (b.isEmpty) return null
    val sb = new java.lang.StringBuilder()
    sb.append(b.head._1.toString)
    var i = 1
    while (i < b.length) {
      sb.append(b(i)._2.toString).append(b(i)._1.toString)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  override def serialize(b: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(b.length)
    b.foreach { case (v, s) =>
      val vb = v.getBytes; val sb2 = s.getBytes
      out.writeInt(vb.length); out.write(vb)
      out.writeInt(sb2.length); out.write(sb2)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new Buf()
    var i = 0
    while (i < n) {
      val vl = in.readInt(); val vb = new Array[Byte](vl); in.readFully(vb)
      val sl = in.readInt(); val sb2 = new Array[Byte](sl); in.readFully(sb2)
      b.bytes += vl.toLong + sl.toLong
      b += ((UTF8String.fromBytes(vb), UTF8String.fromBytes(sb2)))
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): GroupConcatSep =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GroupConcatSep =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): GroupConcatSep =
    copy(value = c(0), sep = c(1))
  override def prettyName: String = "group_concat"
}

object GroupConcatSep {
  /** StringVal's limit in the reference BE (1 GB of character data). */
  val MaxBytesDefault: Long = 1L << 30

  final class ConcatBuf
      extends scala.collection.mutable.ArrayBuffer[(UTF8String, UTF8String)] {
    /** Total accumulated value+separator bytes, maintained by the agg. */
    var bytes: Long = 0L
  }

  /** Session override — lets tests exercise the accumulation cap without
    * a literal gigabyte of input.
    */
  def confMaxBytes: Long =
    try org.apache.spark.sql.internal.SQLConf.get
      .getConfString("graft.group_concat.max_bytes", MaxBytesDefault.toString)
      .toLong
    catch { case _: NumberFormatException => MaxBytesDefault }
}
