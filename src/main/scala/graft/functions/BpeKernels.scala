package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** BPE (byte-pair-encoding) kernels for the distributed subword-merge
  * trainer (CorpusOps.bpeTrain) and encoder — the Sennrich et al. 2016
  * word-level BPE without an end-of-word marker. Per repo convention
  * the per-row hot loops are native expressions, not higher-order
  * lambdas (interpreted, boxing — NOTES.md).
  */

/** bpe_pairs(syms): adjacent symbol pairs of an ARRAY<STRING> as
  * ARRAY<STRUCT<l STRING, r STRING>>, one entry per position
  * (overlapping positions counted — "aaa" emits (a,a) twice, matching
  * the canonical trainer's per-position pair statistics).
  */
case class BpePairs(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bpe_pairs requires ARRAY<STRING>, got ${t.sql}")
  }
  override def dataType: DataType =
    ArrayType(BpeKernels.PairType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeKernels.pairs(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BpeKernels.pairs($c);")
  override protected def withNewChildInternal(newChild: Expression): BpePairs =
    copy(child = newChild)
  override def prettyName: String = "bpe_pairs"
}

/** bpe_apply(syms, l, r): merge every non-overlapping (l, r) adjacency
  * in the symbol array, leftmost-first, into the concatenated symbol —
  * one trainer round's rewrite ("aaa" + (a,a) -> ["aa", "a"]).
  */
case class BpeApply(syms: Expression, l: Expression, r: Expression)
    extends TernaryExpression {
  override def first: Expression = syms
  override def second: Expression = l
  override def third: Expression = r
  override def checkInputDataTypes(): TypeCheckResult =
    (syms.dataType, l.dataType, r.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bpe_apply requires (ARRAY<STRING>, STRING, STRING), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def nullSafeEval(s: Any, lv: Any, rv: Any): Any =
    BpeKernels.apply(s.asInstanceOf[ArrayData],
      lv.asInstanceOf[UTF8String], rv.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, lv, rv) =>
      s"${ev.value} = graft.functions.BpeKernels.apply($s, $lv, $rv);")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BpeApply = copy(syms = f, l = s, r = t)
  override def prettyName: String = "bpe_apply"
}

/** bpe_has_pair(syms, l, r): true when the symbol array contains the
  * (l, r) adjacency — the delta-update trainer's change filter (only
  * such words can alter pair statistics under a merge of (l, r)).
  * Codegen'd predicate: the filter runs over the full word-type table
  * every round, so it must stay out of interpreted HOF lambdas.
  */
case class BpeHasPair(syms: Expression, l: Expression, r: Expression)
    extends TernaryExpression {
  override def first: Expression = syms
  override def second: Expression = l
  override def third: Expression = r
  override def checkInputDataTypes(): TypeCheckResult =
    (syms.dataType, l.dataType, r.dataType) match {
      case (ArrayType(StringType, _), StringType, StringType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"bpe_has_pair requires (ARRAY<STRING>, STRING, STRING), got " +
          s"(${a.sql}, ${b.sql}, ${c.sql})")
    }
  override def dataType: DataType = BooleanType
  override def nullSafeEval(s: Any, lv: Any, rv: Any): Any =
    BpeKernels.hasPair(s.asInstanceOf[ArrayData],
      lv.asInstanceOf[UTF8String], rv.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, lv, rv) =>
      s"${ev.value} = graft.functions.BpeKernels.hasPair($s, $lv, $rv);")
  override protected def withNewChildrenInternal(f: Expression,
      s: Expression, t: Expression): BpeHasPair = copy(syms = f, l = s, r = t)
  override def prettyName: String = "bpe_has_pair"
}

/** bpe_encode(word, merges): tokenize one word with a learned merge
  * table — split to characters, then apply each merge in rank order,
  * leftmost-first (the original Sennrich encode loop; equivalent to
  * lowest-rank-first priority merging). `merges` is the table encoded
  * as ONE foldable string — entries joined by U+0002, left/right by
  * U+0001 (see [[BpeKernels.packMerges]]) — the trainer output is
  * driver-side and rides into the plan as a plain string literal, i.e.
  * an implicit broadcast of the (tiny) merge table. (A previous
  * ARRAY<STRUCT> signature left an UnresolvedAlias inside the argument
  * in some analyzer orders, making `foldable` unanswerable and the
  * expression permanently unresolved under composition.)
  */
case class BpeEncode(word: Expression, merges: Expression)
    extends BinaryExpression {
  override def left: Expression = word
  override def right: Expression = merges
  override def checkInputDataTypes(): TypeCheckResult =
    (word.dataType, merges.dataType) match {
      case (StringType, StringType) if merges.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        "bpe_encode requires (STRING, foldable STRING merge table)")
    }
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)

  @transient private lazy val mergeTable: Array[(UTF8String, UTF8String)] =
    BpeKernels.toMerges(merges)

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeKernels.encode(w.asInstanceOf[UTF8String], mergeTable)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("bpeMerges", mergeTable,
      "scala.Tuple2[]")
    nullSafeCodeGen(ctx, ev, (w, _) =>
      s"${ev.value} = graft.functions.BpeKernels.encode($w, $mRef);")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeEncode = copy(word = newLeft, merges = newRight)
  override def prettyName: String = "bpe_encode"
}

object BpeKernels {
  val PairType: StructType = StructType(Seq(
    StructField("l", StringType, nullable = false),
    StructField("r", StringType, nullable = false)))

  def pairs(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(Array[Any](
        syms.getUTF8String(i).clone(), syms.getUTF8String(i + 1).clone()))
      i += 1
    }
    new GenericArrayData(out)
  }

  def apply(syms: ArrayData, l: UTF8String, r: UTF8String): ArrayData = {
    val n = syms.numElements()
    val out = new mutable.ArrayBuffer[Any](n)
    var i = 0
    while (i < n) {
      if (i < n - 1 && syms.getUTF8String(i).equals(l) &&
        syms.getUTF8String(i + 1).equals(r)) {
        out += UTF8String.concat(l, r)
        i += 2
      } else {
        out += syms.getUTF8String(i).clone()
        i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  def hasPair(syms: ArrayData, l: UTF8String, r: UTF8String): Boolean = {
    val n = syms.numElements()
    var i = 0
    while (i < n - 1) {
      if (syms.getUTF8String(i).equals(l) &&
        syms.getUTF8String(i + 1).equals(r)) return true
      i += 1
    }
    false
  }

  /** Merge-table wire format for bpe_encode's literal argument:
    * entries joined by U+0002, left/right within an entry by U+0001
    * (neither occurs in text symbols). Empty table = empty string.
    */
  def packMerges(merges: Seq[(String, String)]): String =
    merges.map { case (l, r) => l + "\u0001" + r }.mkString("\u0002")

  def toMerges(merges: Expression): Array[(UTF8String, UTF8String)] = {
    val packed = merges.eval().asInstanceOf[UTF8String]
    if (packed == null || packed.numBytes() == 0) return Array.empty
    packed.toString.split('\u0002').map { e =>
      val i = e.indexOf('\u0001')
      (UTF8String.fromString(e.substring(0, i)),
        UTF8String.fromString(e.substring(i + 1)))
    }
  }

  def encode(word: UTF8String,
      merges: Array[(UTF8String, UTF8String)]): ArrayData = {
    // split to characters (code points; the corpus is ASCII but the
    // kernel stays UTF-8-correct)
    var cur = new mutable.ArrayBuffer[UTF8String](word.numChars())
    var i = 0
    val nc = word.numChars()
    while (i < nc) { cur += word.substring(i, i + 1); i += 1 }
    var m = 0
    while (m < merges.length && cur.length > 1) {
      val (l, r) = merges(m)
      var j = 0
      var next: mutable.ArrayBuffer[UTF8String] = null
      while (j < cur.length) {
        if (j < cur.length - 1 && cur(j).equals(l) && cur(j + 1).equals(r)) {
          if (next == null) {
            next = new mutable.ArrayBuffer[UTF8String](cur.length)
            var c = 0
            while (c < j) { next += cur(c); c += 1 }
          }
          next += UTF8String.concat(l, r)
          j += 2
        } else {
          if (next != null) next += cur(j)
          j += 1
        }
      }
      if (next != null) cur = next
      m += 1
    }
    new GenericArrayData(cur.toArray[Any])
  }
}
