package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** Substring-level dedup kernels: winnowed character-k-gram fingerprints
  * and anchor-based maximal-match extension.
  *
  * The operator built on these (DedupOps.substringSpans) is the
  * substring analogue of document-level dedup — find maximal shared
  * character spans >= L between document pairs, the core primitive of
  * exact-substring training-data dedup (Lee et al. 2022, "Deduplicating
  * Training Data Makes Language Models Better"). The reference engine
  * has no substring dedup; this is part of the LLM-pipeline surface the
  * engine adds beyond parity.
  *
  * Scale shape: instead of indexing every k-gram position (1 row per
  * corpus character — the honest cost of a suffix-array scan-through),
  * positions are sampled by SIMPLE WINNOWING (Schleimer, Wilkerson,
  * Aiken, SIGMOD'03): per window of `w` consecutive k-gram hashes keep
  * the rightmost minimal hash. Density is ~2/(w+1) per character, and
  * the winnowing theorem guarantees any shared span of length
  * >= w + k - 1 shares a fingerprint AT THE SAME RELATIVE OFFSET in
  * both copies (the selection inside a window fully contained in the
  * span depends only on span content; rightmost-min tie-break is
  * content-deterministic, history-free). Anchor extension then recovers
  * the exact maximal span, so for minSpan >= w + k - 1 the winnowed
  * output is IDENTICAL to the full-index output — pinned by
  * SubstringDedupSpec (w=12 vs the w=1 full index) and by the DuckDB
  * oracle, which recomputes spans from the full position index as
  * per-diagonal islands of matching k-grams.
  */

/** winnow_grams(text, k, w): winnowed k-gram fingerprints of `text` as
  * ARRAY<STRUCT<pos INT, h BIGINT>>; pos is the 1-based position of the
  * k-gram (byte == character position: ASCII corpus), h a mixed 64-bit
  * rolling polynomial hash of its bytes. w = 1 degenerates to the full
  * index (every position selected). Texts shorter than k yield an
  * empty array.
  */
case class WinnowGrams(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if k >= 2 && w >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      "winnow_grams requires k >= 2 and w >= 1")
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_grams requires STRING input, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(
    SubstrFingerprints.FpType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    SubstrFingerprints.winnowGrams(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SubstrFingerprints.winnowGrams($c, $k, $w);")
  override protected def withNewChildInternal(newChild: Expression): WinnowGrams =
    copy(child = newChild)
  override def prettyName: String = "winnow_grams"
}

/** extend_spans(ta, tb, anchors): for each anchor STRUCT<pa INT, pb INT>
  * (1-based positions into ta/tb), extend the match maximally left and
  * right while bytes are equal — the right extension starts AT the
  * anchor, so anchor k-grams are char-verified (a 64-bit fingerprint
  * collision extends to a genuine, possibly empty, common run and is
  * then length-filtered, never trusted). Returns the DISTINCT maximal
  * spans as ARRAY<STRUCT<a_start INT, b_start INT, span_len INT>>
  * (zero-length runs dropped); each span is a maximal per-diagonal
  * common substring — exactly one "island" of the full k-gram index.
  */
case class ExtendSpans(ta: Expression, tb: Expression, anchors: Expression)
    extends TernaryExpression {
  override def first: Expression = ta
  override def second: Expression = tb
  override def third: Expression = anchors

  override def checkInputDataTypes(): TypeCheckResult =
    (ta.dataType, tb.dataType, anchors.dataType) match {
      case (StringType, StringType, ArrayType(s: StructType, _))
          if s.length == 2 && s.forall(_.dataType == IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "extend_spans requires (STRING, STRING, ARRAY<STRUCT<INT,INT>>), " +
          s"got (${a.sql}, ${b.sql}, ${c.sql})")
    }
  override def dataType: DataType = ArrayType(
    SubstrFingerprints.SpanType, containsNull = false)
  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    SubstrFingerprints.extendSpans(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], c.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, c) =>
      s"${ev.value} = graft.functions.SubstrFingerprints.extendSpans($a, $b, $c);")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): ExtendSpans =
    copy(ta = f, tb = s, anchors = t)
  override def prettyName: String = "extend_spans"
}

/** cut_spans(text, intervals): remove the given 1-based [s, e) char
  * intervals from `text` and return the concatenation of what remains.
  * Intervals are sorted by start internally (collect_list order is
  * nondeterministic) and are expected non-overlapping (the caller
  * merges islands first); overlapping input is still handled safely by
  * cutting from max(cursor, s).
  */
case class CutSpans(text: Expression, intervals: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = intervals
  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, intervals.dataType) match {
      case (StringType, ArrayType(s: StructType, _))
          if s.length == 2 && s.forall(_.dataType == IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"cut_spans requires (STRING, ARRAY<STRUCT<INT,INT>>), got " +
          s"(${a.sql}, ${b.sql})")
    }
  override def dataType: DataType = StringType
  override def nullSafeEval(t: Any, iv: Any): Any =
    SubstrFingerprints.cutSpans(t.asInstanceOf[UTF8String],
      iv.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, iv) =>
      s"${ev.value} = graft.functions.SubstrFingerprints.cutSpans($t, $iv);")
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CutSpans =
    copy(text = newLeft, intervals = newRight)
  override def prettyName: String = "cut_spans"
}

object SubstrFingerprints {
  val FpType: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("h", LongType, nullable = false)))
  val SpanType: StructType = StructType(Seq(
    StructField("a_start", IntegerType, nullable = false),
    StructField("b_start", IntegerType, nullable = false),
    StructField("span_len", IntegerType, nullable = false)))

  private val B = 0x100000001b3L // FNV prime as polynomial base (odd)

  /** splitmix64 finalizer: winnowing selects MINIMA, so the per-gram
    * hash must be uniformly mixed (raw polynomial low bits are not).
    */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def winnowGrams(text: UTF8String, k: Int, w: Int): ArrayData = {
    val bytes = text.getBytes
    val m = bytes.length - k + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // rolling polynomial hash over the k-byte window, 2^64 ring
    var bk = 1L // B^(k-1)
    var i = 1
    while (i < k) { bk *= B; i += 1 }
    val hs = new Array[Long](m)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    hs(0) = mix(h)
    i = 1
    while (i < m) {
      h = (h - (bytes(i - 1) & 0xffL) * bk) * B + (bytes(i + k - 1) & 0xffL)
      hs(i) = mix(h)
      i += 1
    }
    // simple winnowing via monotonic deque: per window of wEff grams,
    // keep the rightmost minimal hash (>= pop makes later equals win);
    // consecutive windows selecting the same position emit once.
    val wEff = math.min(w, m)
    val out = new mutable.ArrayBuffer[Any](2 * m / (wEff + 1) + 2)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    var last = -1
    var j = 0
    while (j < m) {
      while (tail > head && unsignedGte(hs(deque(tail - 1)), hs(j))) tail -= 1
      deque(tail) = j
      tail += 1
      if (j >= wEff - 1) {
        val lo = j - wEff + 1
        while (deque(head) < lo) head += 1
        val sel = deque(head)
        if (sel != last) {
          out += new GenericInternalRow(Array[Any](sel + 1, hs(sel)))
          last = sel
        }
      }
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def unsignedGte(a: Long, b: Long): Boolean =
    java.lang.Long.compareUnsigned(a, b) >= 0

  def cutSpans(text: UTF8String, intervals: ArrayData): UTF8String = {
    val bytes = text.getBytes // ASCII corpus: byte == char positions
    val n = intervals.numElements()
    if (n == 0) return text
    val ivs = Array.tabulate(n) { i =>
      val r = intervals.getStruct(i, 2)
      (r.getInt(0), r.getInt(1))
    }.sortBy(_._1)
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var cursor = 0 // 0-based
    var i = 0
    while (i < ivs.length) {
      val s = math.max(ivs(i)._1 - 1, cursor)
      val e = math.max(ivs(i)._2 - 1, cursor)
      if (s > cursor) out.write(bytes, cursor, math.min(s, bytes.length) - cursor)
      cursor = math.max(cursor, math.min(e, bytes.length))
      i += 1
    }
    if (cursor < bytes.length) out.write(bytes, cursor, bytes.length - cursor)
    UTF8String.fromBytes(out.toByteArray)
  }

  def extendSpans(ta: UTF8String, tb: UTF8String,
      anchors: ArrayData): ArrayData = {
    val a = ta.getBytes
    val b = tb.getBytes
    val n = anchors.numElements()
    val seen = new mutable.HashSet[Long]()
    val out = new mutable.ArrayBuffer[Any]()
    var i = 0
    while (i < n) {
      val anc = anchors.getStruct(i, 2)
      val pa = anc.getInt(0) - 1
      val pb = anc.getInt(1) - 1
      if (pa >= 0 && pa < a.length && pb >= 0 && pb < b.length) {
        var s = 0
        while (pa - s - 1 >= 0 && pb - s - 1 >= 0 &&
          a(pa - s - 1) == b(pb - s - 1)) s += 1
        var e = 0
        while (pa + e < a.length && pb + e < b.length &&
          a(pa + e) == b(pb + e)) e += 1
        val len = s + e
        if (len > 0) {
          val aStart = pa - s + 1
          val bStart = pb - s + 1
          val key = (aStart.toLong << 32) | (bStart.toLong & 0xffffffffL)
          if (seen.add(key)) {
            out += new GenericInternalRow(Array[Any](aStart, bStart, len))
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
